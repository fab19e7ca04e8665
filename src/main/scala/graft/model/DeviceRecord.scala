package graft.model

/** The normalized device record — the engine's core row type
  * (SURVEY §1.4): fixed core fields + an open `specs` map replacing the
  * reference's ALTER-TABLE-per-key dynamic columns (app.js:365-375) and
  * `_pN` 150-column chunking (app.js:333-363), neither of which columnar
  * storage needs.
  */
case class DeviceRecord(
    brand: String,
    model: String,
    imgUrl: String,
    srcUrl: String,
    productId: String,
    device: String,
    specs: Map[String, String])
