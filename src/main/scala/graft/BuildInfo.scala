package graft

/** Package/version surface — the reference's `__version__` contract
  * (tinymr.py:16-24, pinned by tests/test_packaging.py:6-13): version
  * comes from real package metadata when the artifact is installed, and
  * falls back to `"0.0"` when the code runs un-packaged (the
  * reference's single-file-copy case; here, unpacked `target/classes`
  * during development, where no jar manifest exists).
  */
object BuildInfo {

  /** The JVM's package metadata — the `Implementation-Version` manifest
    * attribute sbt writes into the packaged jar (the analog of
    * `importlib.metadata.version`). Null when running from classes.
    */
  private def metadataVersion: Option[String] =
    Option(getClass.getPackage).flatMap(p => Option(p.getImplementationVersion))

  /** `tinymr.__version__`: metadata when packaged, "0.0" otherwise. */
  val version: String = metadataVersion.getOrElse("0.0")
}
