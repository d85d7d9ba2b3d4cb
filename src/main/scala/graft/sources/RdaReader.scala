package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, InputStream}

/** Minimal reader for R's serialization format (`.rda` / `.rds`,
  * version-2/3 XDR), enough to load the reference's five bundled
  * datasets (the `.rda` files under `/root/reference/data`: data.frames, numeric
  * matrices, factors, and Matrix-package `dgCMatrix` S4 sparse
  * matrices) without an R runtime.
  *
  * Format: R Internals §"Serialization Formats" (public). A `.rda` is
  * a compressed stream `RDX2\nX\n` (or `RDX3`) + three version ints +
  * one serialized pairlist of name->value bindings. Each item is a
  * 32-bit flags word (`type = flags & 0xFF`, attr bit 0x200, tag bit
  * 0x400, ref index in the high bits for REFSXP) followed by
  * type-specific payload, big-endian throughout. Only the SEXP types
  * those datasets use are implemented; anything else raises with the
  * type code so a future widening knows what it hit.
  *
  * Compression: gzip / bzip2 / xz autodetected by magic bytes
  * (commons-compress ships with Spark).
  */
object RdaReader {

  sealed trait RObj
  case object RNull extends RObj
  final case class RSym(name: String) extends RObj
  final case class RInt(values: Array[Int], attrs: Map[String, RObj])
    extends RObj
  final case class RReal(values: Array[Double], attrs: Map[String, RObj])
    extends RObj
  final case class RLgl(values: Array[Int], attrs: Map[String, RObj])
    extends RObj
  final case class RStr(values: Array[String], attrs: Map[String, RObj])
    extends RObj
  final case class RList(values: Array[RObj], attrs: Map[String, RObj])
    extends RObj
  final case class RS4(attrs: Map[String, RObj]) extends RObj

  def attrsOf(o: RObj): Map[String, RObj] = o match {
    case v: RInt  => v.attrs
    case v: RReal => v.attrs
    case v: RLgl  => v.attrs
    case v: RStr  => v.attrs
    case v: RList => v.attrs
    case v: RS4   => v.attrs
    case _        => Map.empty
  }

  def names(o: RObj): Array[String] = attrsOf(o).get("names") match {
    case Some(RStr(v, _)) => v
    case _                => Array.empty
  }

  val IntNa: Int = Int.MinValue

  // ---- decompression ---------------------------------------------------

  private def decompress(path: String): Array[Byte] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val in: InputStream =
      if (raw.length >= 3 && raw(0) == 'B' && raw(1) == 'Z' && raw(2) == 'h')
        new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorInputStream(new ByteArrayInputStream(raw))
      else if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        new java.util.zip.GZIPInputStream(new ByteArrayInputStream(raw))
      else if (raw.length >= 6 && (raw(0) & 0xFF) == 0xFD && raw(1) == '7' &&
        raw(2) == 'z')
        new org.apache.commons.compress.compressors.xz
          .XZCompressorInputStream(new ByteArrayInputStream(raw))
      else new ByteArrayInputStream(raw)
    try in.readAllBytes() finally in.close()
  }

  // ---- parser ----------------------------------------------------------

  private final class Parser(bytes: Array[Byte]) {
    private val in = new DataInputStream(new ByteArrayInputStream(bytes))
    private val refs = scala.collection.mutable.ArrayBuffer[RObj]()

    def header(): Unit = {
      val magic = new Array[Byte](5)
      in.readFully(magic)
      val m = new String(magic, "US-ASCII")
      require(m == "RDX2\n" || m == "RDX3\n", s"not an rda: $m")
      val fmt = new Array[Byte](2)
      in.readFully(fmt)
      require(new String(fmt, "US-ASCII") == "X\n",
        "only XDR (binary) serialization is supported")
      in.readInt(); in.readInt(); in.readInt() // version, writer, min-reader
      if (m == "RDX3\n") { // v3 adds the native-encoding string
        val n = in.readInt()
        in.skipBytes(n)
      }
    }

    private def readLength(): Int = {
      val n = in.readInt()
      if (n >= 0) n
      else { // long-vector escape: two ints; datasets never need it
        val hi = in.readInt(); val lo = in.readInt()
        require(hi == 0, "long vectors unsupported")
        lo
      }
    }

    private def readCharsxp(): String = {
      val flags = in.readInt()
      require((flags & 0xFF) == 9, s"expected CHARSXP, got ${flags & 0xFF}")
      val n = in.readInt()
      if (n == -1) null
      else {
        val b = new Array[Byte](n)
        in.readFully(b)
        new String(b, "UTF-8")
      }
    }

    /** Attribute pairlist (LISTSXP chain) -> name->value map. */
    private def readAttrPairlist(firstFlags: Int): Map[String, RObj] = {
      var m = Map.empty[String, RObj]
      var flags = firstFlags
      while ((flags & 0xFF) != 254) { // NILVALUE terminates the chain
        require((flags & 0xFF) == 2, s"expected LISTSXP, got ${flags & 0xFF}")
        require((flags & 0x400) != 0, "attribute pairlist entry without tag")
        val tag = readItem(in.readInt()) match {
          case RSym(n) => n
          case other   => sys.error(s"attr tag is not a symbol: $other")
        }
        val value = readItem(in.readInt())
        m += (tag -> value)
        flags = in.readInt() // CDR
      }
      m
    }

    def readItem(flags: Int): RObj = {
      val typ = flags & 0xFF
      val hasAttr = (flags & 0x200) != 0
      typ match {
        case 254 => RNull
        case 255 => // REFSXP
          val i = flags >>> 8
          val idx = if (i == 0) in.readInt() else i
          refs(idx - 1)
        case 1 => // SYMSXP
          val sym = RSym(readCharsxp())
          refs += sym
          sym
        case 9 => // bare CHARSXP (rare at top level)
          val n = in.readInt()
          val b = new Array[Byte](math.max(n, 0)); in.readFully(b)
          RStr(Array(new String(b, "UTF-8")), Map.empty)
        case 10 | 13 => // LGLSXP | INTSXP
          val n = readLength()
          val v = new Array[Int](n)
          var i = 0
          while (i < n) { v(i) = in.readInt(); i += 1 }
          val a = if (hasAttr) readAttrPairlist(in.readInt()) else Map.empty[String, RObj]
          if (typ == 10) RLgl(v, a) else RInt(v, a)
        case 14 => // REALSXP
          val n = readLength()
          val v = new Array[Double](n)
          var i = 0
          while (i < n) { v(i) = in.readDouble(); i += 1 }
          val a = if (hasAttr) readAttrPairlist(in.readInt()) else Map.empty[String, RObj]
          RReal(v, a)
        case 16 => // STRSXP
          val n = readLength()
          val v = Array.fill(n)(readCharsxp())
          val a = if (hasAttr) readAttrPairlist(in.readInt()) else Map.empty[String, RObj]
          RStr(v, a)
        case 19 => // VECSXP (generic list)
          val n = readLength()
          val v = Array.fill[RObj](n)(readItem(in.readInt()))
          val a = if (hasAttr) readAttrPairlist(in.readInt()) else Map.empty[String, RObj]
          RList(v, a)
        case 25 => // S4SXP: payload is just the attribute pairlist
          val a = if (hasAttr) readAttrPairlist(in.readInt()) else Map.empty[String, RObj]
          RS4(a)
        case 2 => // LISTSXP outside attribute position (top-level bindings)
          sys.error("use readBindings() for pairlists")
        case t => sys.error(s"unsupported SEXP type $t (flags=$flags)")
      }
    }

    /** Top-level .rda object: tagged pairlist name -> value. */
    def readBindings(): Map[String, RObj] = {
      var m = Map.empty[String, RObj]
      var flags = in.readInt()
      while ((flags & 0xFF) != 254) {
        require((flags & 0xFF) == 2, s"expected binding LISTSXP, got ${flags & 0xFF}")
        if ((flags & 0x200) != 0) readAttrPairlist(in.readInt()) // discard
        val tag = readItem(in.readInt()) match {
          case RSym(n) => n
          case other   => sys.error(s"binding tag is not a symbol: $other")
        }
        val value = readItem(in.readInt())
        m += (tag -> value)
        flags = in.readInt()
      }
      m
    }
  }

  /** Load a .rda workspace: name -> object for every saved binding. */
  def read(path: String): Map[String, RObj] = {
    val p = new Parser(decompress(path))
    p.header()
    p.readBindings()
  }

  // ---- dataset-shaped accessors ---------------------------------------

  /** A factor (INTSXP + levels) as its label strings. */
  def factorLabels(o: RObj): Array[String] = o match {
    case RInt(codes, attrs) =>
      val levels = attrs.get("levels") match {
        case Some(RStr(v, _)) => v
        case _                => sys.error("factor without levels")
      }
      codes.map(c => if (c == IntNa) null else levels(c - 1))
    case _ => sys.error(s"not a factor: $o")
  }

  /** Numeric column vector (REALSXP, INTSXP, or LGLSXP) as doubles. */
  def numeric(o: RObj): Array[Double] = o match {
    case RReal(v, _) => v
    case RInt(v, _)  => v.map(x => if (x == IntNa) Double.NaN else x.toDouble)
    case RLgl(v, _)  => v.map(x => if (x == IntNa) Double.NaN else x.toDouble)
    case _           => sys.error(s"not numeric: $o")
  }

  /** data.frame (VECSXP of columns + names) -> (colNames, columns),
    * each column as doubles. */
  def numericFrame(o: RObj): (Array[String], Array[Array[Double]]) = o match {
    case l @ RList(cols, _) => (names(l), cols.map(numeric))
    case _                  => sys.error(s"not a data.frame: $o")
  }

  /** Dense column-major matrix (REALSXP + dim) -> (nRow, nCol, data). */
  def denseMatrix(o: RObj): (Int, Int, Array[Double]) = o match {
    case RReal(v, attrs) =>
      attrs.get("dim") match {
        case Some(RInt(Array(nr, nc), _)) => (nr, nc, v)
        case _ => sys.error("numeric vector without dim")
      }
    case _ => sys.error(s"not a dense matrix: $o")
  }

  /** Matrix-package dgCMatrix (S4, CSC) -> (nRow, nCol, colPtr,
    * rowIdx, values). */
  def sparseCsc(o: RObj): (Int, Int, Array[Int], Array[Int], Array[Double]) =
    o match {
      case RS4(attrs) =>
        val RInt(dim, _) = attrs("Dim")
        val RInt(p, _) = attrs("p")
        val RInt(i, _) = attrs("i")
        val RReal(x, _) = attrs("x")
        (dim(0), dim(1), p, i, x)
      case _ => sys.error(s"not a dgCMatrix: $o")
    }
}
