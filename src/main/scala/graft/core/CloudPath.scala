package graft.core

/** Cloudpath parsing + plugin dispatch (S1).
  *
  * `FORMAT://PROTOCOL://BUCKET/PATH` per paths.py:13-120
  * (strict_extract / extract_format_protocol): the leading token may
  * be a format (explicit) or a protocol (format defaults to
  * "precomputed"); a second format token is an error. Field semantics
  * mirror the reference's ExtractedPath (test_paths.py:10-133):
  * `layer` is the LAST path segment, `dataset` the second-to-last
  * (the bucket itself for a two-segment path; everything for a
  * bucket-only path), `basepath` is the whole path minus the layer,
  * `noBucketBasepath` is basepath minus the bucket — intermediate
  * directories live there, NOT in dataset. file:// paths keep their
  * leading slash on the bucket ("/tmp"), matching the reference.
  */
final case class CloudPath(
    format: String,
    protocol: String,
    bucket: String,
    basepath: String,
    noBucketBasepath: String,
    dataset: String,
    layer: String) {
  /** Render back to canonical form (paths.py:42-46 ascloudpath). */
  def render: String = {
    val tail =
      if (basepath.isEmpty) layer
      else if (layer.isEmpty) basepath
      else s"$basepath/$layer"
    s"$format://$protocol://$tail"
  }
  /** Filesystem path for file:// (absolute; bucket carries the root
    * slash for file paths, others get one prepended).
    */
  def localPath: String = {
    val joined =
      if (basepath.isEmpty) layer
      else if (layer.isEmpty) basepath
      else s"$basepath/$layer"
    if (joined.startsWith("/")) joined else s"/$joined"
  }
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
    val segs = rest.split("/").filter(_.nonEmpty)
    val n = segs.length
    // file:// keeps the absolute path's root slash on the bucket
    // (test_paths.py: extract('file:///tmp/dataset/layer').bucket ==
    // "/tmp")
    val bucketSeg =
      if (n == 0) ""
      else if (proto == "file" && rest.startsWith("/")) "/" + segs(0)
      else segs(0)
    if (n <= 1)
      // bucket-only path: dataset and layer both collapse to the
      // bucket, basepath is empty (strict_extract("precomputed://
      // gs://bucket32_24") in test_paths.py)
      CloudPath(fmt, proto, bucketSeg, "", "", bucketSeg, bucketSeg)
    else {
      val layer = segs(n - 1)
      val noBucket = segs.slice(1, n - 1).mkString("/")
      val basepath =
        if (noBucket.isEmpty) bucketSeg else s"$bucketSeg/$noBucket"
      CloudPath(fmt, proto, bucketSeg, basepath, noBucket, segs(n - 2),
        layer)
    }
  }
}
