package graft.regrid

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

/** Minimal NetCDF-3 ("classic") codec for ESMF/xESMF weight files —
  * pure Scala, no external codec, implemented from the public NetCDF
  * classic-format specification (the format scipy.io.netcdf and
  * xarray's scipy engine write, and every NetCDF library reads).
  *
  * Scope, stated honestly: this is the CLASSIC binary format (magic
  * `CDF\x01`, plus the `CDF\x02` 64-bit-offset variant on read). It
  * covers the reference's weight-file layer — `frontend.py:264-280`
  * writes a Dataset of 1-D variables `col`, `row`, `S` over one
  * dimension `n_s`, and `smm.py:10-41` reads exactly those three back.
  * NetCDF-4 files (HDF5 containers) are out of scope; they need an
  * HDF5 stack this container does not have.
  *
  * Weight files are single-node artifacts by the reference's own
  * design (it materializes the scipy COO in RAM, `smm.py:34-41`), so a
  * driver-side read/write with the same replicate-W ceiling as
  * [[SlabApplier]] is the right scale posture; cluster-scale weights
  * persist as (bucketed) Parquet instead ([[WeightsIO]]).
  */
object NetCDF3 {

  // classic-format tags (NetCDF spec, "Format" appendix)
  private val NC_DIMENSION = 0x0A
  private val NC_VARIABLE = 0x0B
  private val NC_ATTRIBUTE = 0x0C
  val NC_INT = 4
  val NC_FLOAT = 5
  val NC_DOUBLE = 6

  private def pad4(n: Long): Long = (n + 3) / 4 * 4

  /** One parsed variable: dimension LENGTHS (resolved), external type,
    * and the byte offset of its data block. */
  final case class NcVar(name: String, ncType: Int, dimLens: Seq[Long], begin: Long) {
    def nElems: Long = dimLens.product
  }

  // ---------------- read ----------------

  /** Parse the header of a classic (CDF1) or 64-bit-offset (CDF2) file
    * and return its non-record variables. Attributes are skipped; record
    * variables (unlimited dimension) are rejected — weight files have
    * none. */
  def readHeader(bytes: Array[Byte]): Seq[NcVar] = {
    val b = ByteBuffer.wrap(bytes) // big-endian by default
    require(b.get() == 'C' && b.get() == 'D' && b.get() == 'F',
      "not a NetCDF classic file (bad magic; NetCDF-4/HDF5 is out of scope)")
    val version = b.get()
    require(version == 1 || version == 2,
      s"unsupported NetCDF classic version byte $version (CDF1/CDF2 only)")
    b.getInt() // numrecs (0 for weight files)

    def readName(): String = {
      val n = b.getInt()
      val s = new Array[Byte](n)
      b.get(s)
      b.position(b.position() + (pad4(n) - n).toInt)
      new String(s, "UTF-8")
    }
    def readTagList(expected: Int): Int = {
      val tag = b.getInt()
      val n = b.getInt()
      require((tag == expected && n >= 0) || (tag == 0 && n == 0),
        s"malformed header: tag $tag count $n (expected $expected)")
      n
    }
    // dim_list
    val nDims = readTagList(NC_DIMENSION)
    val dimLen = (0 until nDims).map { _ =>
      val _ = readName()
      b.getInt().toLong // 0 would mean the record dimension
    }
    // gatt_list — skip values
    def skipAttrs(): Unit = {
      val nAtts = readTagList(NC_ATTRIBUTE)
      (0 until nAtts).foreach { _ =>
        readName()
        val tpe = b.getInt()
        val n = b.getInt()
        val sz = tpe match {
          case 1 | 2 => n.toLong          // byte, char
          case 3     => 2L * n            // short
          case NC_INT | NC_FLOAT => 4L * n
          case NC_DOUBLE => 8L * n
          case t => throw new IllegalArgumentException(s"bad attr type $t")
        }
        b.position(b.position() + pad4(sz).toInt)
      }
    }
    skipAttrs()
    // var_list
    val nVars = readTagList(NC_VARIABLE)
    (0 until nVars).map { _ =>
      val name = readName()
      val nd = b.getInt()
      val dims = (0 until nd).map(_ => b.getInt())
      skipAttrs()
      val tpe = b.getInt()
      b.getInt() // vsize (may be a lie for the last var; recomputed from dims)
      val begin = if (version == 1) b.getInt().toLong else b.getLong()
      dims.foreach(d => require(dimLen(d) > 0,
        s"variable $name uses the record dimension — not a weight file"))
      NcVar(name, tpe, dims.map(dimLen), begin)
    }
  }

  private def readNumeric(bytes: Array[Byte], v: NcVar): Array[Double] = {
    val b = ByteBuffer.wrap(bytes)
    b.position(v.begin.toInt)
    val n = v.nElems.toInt
    val out = new Array[Double](n)
    var i = 0
    v.ncType match {
      case NC_INT    => while (i < n) { out(i) = b.getInt().toDouble; i += 1 }
      case NC_DOUBLE => while (i < n) { out(i) = b.getDouble(); i += 1 }
      case NC_FLOAT  => while (i < n) { out(i) = b.getFloat().toDouble; i += 1 }
      case t => throw new IllegalArgumentException(
        s"variable ${v.name}: unsupported external type $t (int/float/double only)")
    }
    out
  }

  /** Read an ESMF-convention weight file: returns `(col, row, S)` with
    * the indices EXACTLY as stored (1-based in ESMF files — the caller
    * shifts, mirroring `smm.py:21-22`). */
  def readTriplets(path: String): (Array[Long], Array[Long], Array[Double]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val vars = readHeader(bytes).map(v => v.name -> v).toMap
    def need(n: String) = vars.getOrElse(n,
      throw new IllegalArgumentException(
        s"weight file $path has no variable '$n' (found: ${vars.keys.mkString(", ")})"))
    val (c, r, s) = (need("col"), need("row"), need("S"))
    require(c.nElems == r.nElems && r.nElems == s.nElems,
      s"col/row/S lengths differ: ${c.nElems}/${r.nElems}/${s.nElems}")
    (readNumeric(bytes, c).map(_.toLong), readNumeric(bytes, r).map(_.toLong),
      readNumeric(bytes, s))
  }

  // ---------------- write ----------------

  /** Write an ESMF-convention weight file (CDF1): one dimension `n_s`,
    * variables `col` (int), `row` (int), `S` (double) — the layout of
    * `frontend.py:264-280`. Indices are written EXACTLY as given
    * (callers pass 1-based values for ESMF convention). */
  def writeTriplets(path: String, colV: Array[Int], rowV: Array[Int],
                    sV: Array[Double]): Unit = {
    require(colV.length == rowV.length && rowV.length == sV.length,
      s"col/row/S lengths differ: ${colV.length}/${rowV.length}/${sV.length}")
    // a fixed dimension of length 0 is indistinguishable from the
    // record dimension in the classic format — an empty weight set is
    // unrepresentable, and a 0-length n_s would make this codec's own
    // reader (and external NetCDF readers) treat n_s as unlimited
    require(colV.nonEmpty,
      "cannot write an empty weight set as NetCDF-3: dimension length 0 " +
        "denotes the record dimension in the classic format")
    val n = colV.length

    def nameBytes(s: String): Array[Byte] = {
      val raw = s.getBytes("UTF-8")
      val out = new Array[Byte](4 + pad4(raw.length).toInt)
      ByteBuffer.wrap(out).putInt(raw.length).put(raw)
      out
    }
    // header size: magic(4) + numrecs(4) + dim_list + gatt(8) + var_list
    val dimList = ByteBuffer.allocate(8 + nameBytes("n_s").length + 4)
      .putInt(NC_DIMENSION).putInt(1).put(nameBytes("n_s")).putInt(n).array()
    def varEntry(name: String, tpe: Int, vsize: Long, begin: Long): Array[Byte] = {
      val nb = nameBytes(name)
      ByteBuffer.allocate(nb.length + 4 + 4 + 8 + 4 + 4 + 4)
        .put(nb).putInt(1).putInt(0)          // 1 dim, dimid 0
        .putInt(0).putInt(0)                  // vatt_list ABSENT
        .putInt(tpe).putInt(vsize.toInt).putInt(begin.toInt).array()
    }
    val intSize = pad4(4L * n)
    val dblSize = 8L * n
    // compute begins: header length first (two-pass with fixed entry sizes)
    val varEntryLen = (name: String) => nameBytes(name).length + 28
    val headerLen = 8 + dimList.length + 8 /*gatt ABSENT*/ + 8 +
      varEntryLen("col") + varEntryLen("row") + varEntryLen("S")
    val beginCol = headerLen.toLong
    val beginRow = beginCol + intSize
    val beginS = beginRow + intSize
    require(beginS + dblSize <= Int.MaxValue.toLong,
      s"weight file would exceed the CDF1 2 GiB offset range ($n triplets); " +
        "persist cluster-scale weights as Parquet instead (WeightsIO)")

    val out = new DataOutputStream(new BufferedOutputStream(
      new FileOutputStream(path), 1 << 20))
    try {
      out.write(Array[Byte]('C', 'D', 'F', 1))
      out.writeInt(0) // numrecs
      out.write(dimList)
      out.writeInt(0); out.writeInt(0) // gatt_list ABSENT
      out.writeInt(NC_VARIABLE); out.writeInt(3)
      out.write(varEntry("col", NC_INT, intSize, beginCol))
      out.write(varEntry("row", NC_INT, intSize, beginRow))
      out.write(varEntry("S", NC_DOUBLE, dblSize, beginS))
      def writeInts(a: Array[Int]): Unit = {
        a.foreach(out.writeInt)
        (4L * n until intSize).foreach(_ => out.writeByte(0))
      }
      writeInts(colV)
      writeInts(rowV)
      sV.foreach(out.writeDouble)
    } finally out.close()
  }
}
