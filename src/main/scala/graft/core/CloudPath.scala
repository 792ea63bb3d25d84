package graft.core

/** Cloudpath parsing + plugin dispatch (S1).
  *
  * `FORMAT://PROTOCOL://BUCKET/PATH` per paths.py:13-120
  * (strict_extract / extract_format_protocol): the leading token may
  * be a format (explicit) or a protocol (format defaults to
  * "precomputed"); a second format token is an error; the last path
  * segment is the layer, the rest after the bucket is the dataset.
  */
final case class CloudPath(
    format: String,
    protocol: String,
    bucket: String,
    dataset: String,
    layer: String) {
  /** Render back to canonical form (paths.py:42-46 ascloudpath). */
  def render: String = {
    val tail = Seq(bucket, dataset, layer).filter(_.nonEmpty).mkString("/")
    s"$format://$protocol://$tail"
  }
  /** Filesystem path for file:// (bucket is the leading root dir). */
  def localPath: String = s"/$bucket/$dataset/$layer"
}

object CloudPath {
  val AllowedFormats: Set[String] =
    Set("graphene", "precomputed", "boss", "n5", "zarr", "zarr2", "zarr3")
  val AllowedProtocols: Set[String] =
    Set("gs", "s3", "file", "http", "https", "mem", "matrix", "tigerdata")

  private val ProtoRe = """^(\w+(?:\+\w+)?)://""".r

  private def popProtocol(s: String): (Option[String], String) =
    ProtoRe.findFirstMatchIn(s) match {
      case Some(m) => (Some(m.group(1)), s.substring(m.end))
      case None => (None, s)
    }

  def parse(cloudpath: String): CloudPath = {
    val (first, rest1) = popProtocol(cloudpath)
    val tok1 = first.getOrElse(
      throw new IllegalArgumentException(s"no protocol in $cloudpath"))
    val (fmt, proto, rest) =
      if (AllowedProtocols.contains(tok1)) {
        // ANY scheme token after the protocol is an error — known
        // formats are misordered (gs://graphene://, paths.py:117-118)
        // and unknown ones would silently become a garbage bucket
        popProtocol(rest1)._1.foreach { second =>
          throw new IllegalArgumentException(
            s"unexpected scheme token $second:// after protocol in $cloudpath")
        }
        ("precomputed", tok1, rest1)
      }
      else if (AllowedFormats.contains(tok1)) {
        val (second, rest2) = popProtocol(rest1)
        val p = second.getOrElse(throw new IllegalArgumentException(
          s"format $tok1 without protocol in $cloudpath"))
        if (AllowedFormats.contains(p))
          throw new IllegalArgumentException(s"double format in $cloudpath")
        if (!AllowedProtocols.contains(p))
          throw new IllegalArgumentException(s"unknown protocol $p")
        (tok1, p, rest2)
      } else throw new IllegalArgumentException(s"unknown token $tok1")
    val clean = rest.stripPrefix("/").stripSuffix("/")
    val segs = clean.split("/").filter(_.nonEmpty)
    val bucket = segs.headOption.getOrElse("")
    val layer = if (segs.length > 1) segs.last else ""
    val dataset = segs.drop(1).dropRight(1).mkString("/")
    CloudPath(fmt, proto, bucket, dataset, layer)
  }
}
