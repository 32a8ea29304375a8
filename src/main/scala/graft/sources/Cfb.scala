package graft.sources

/** Minimal reader for the OLE2 / MS-CFB compound-file container (the
  * on-disk format wrapping the legacy .doc and .ppt binaries —
  * bones.py:33,41 route them to UnstructuredWordDocumentLoader /
  * UnstructuredPowerPointLoader; here the container itself is parsed
  * pure-JVM from the published [MS-CFB] layout). Supports v3 (512 B
  * sectors) and v4 (4096 B), the DIFAT chain, FAT chains, and the
  * mini-FAT/mini-stream path for streams under the cutoff.
  *
  * Reads are defensive: every malformed structure throws
  * IllegalArgumentException so DocLoader's per-file Try degrades the
  * file to its placeholder instead of crashing the load job. The
  * directory is scanned LINEARLY (every 128-byte entry in the
  * directory chain) rather than via the red-black name tree — the
  * tree adds lookup speed for huge directories but a corrupt tree
  * would hide streams a linear scan still finds.
  */
object Cfb {

  private val Signature = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE
  private val FatSect = 0xFFFFFFFD
  private val DifatSect = 0xFFFFFFFC

  def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** One parsed container: directory entries + the means to read any
    * stream's bytes. */
  final class File private[Cfb] (bytes: Array[Byte]) {
    require(bytes.length >= 512, "truncated CFB header")
    require(Signature.zipWithIndex.forall { case (v, i) =>
      (bytes(i) & 0xFF) == v }, "not a CFB container")

    private val sectorShift = u16(bytes, 30)
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported CFB sector shift $sectorShift")
    private val sectorSize = 1 << sectorShift
    private val miniShift = u16(bytes, 32)
    require(miniShift == 6, s"unsupported mini sector shift $miniShift")
    private val miniCutoff = i32(bytes, 56)
    private val maxSector = (bytes.length - 1) / sectorSize // inclusive bound

    private def sectorOff(n: Int): Int = (n + 1) << sectorShift

    private def readSector(n: Int): Array[Byte] = {
      require(n >= 0 && n < maxSector, s"sector $n out of range")
      val off = sectorOff(n)
      java.util.Arrays.copyOfRange(bytes, off,
        math.min(off + sectorSize, bytes.length))
    }

    // ---- FAT (via the header DIFAT + DIFAT sector chain) ----
    private val fat: Array[Int] = {
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109) {
        val e = i32(bytes, 76 + 4 * i)
        if (e != FreeSect && e != EndOfChain) fatSectors += e
        i += 1
      }
      var difat = i32(bytes, 68)
      val perDifat = sectorSize / 4 - 1
      var guard = 0
      while (difat != EndOfChain && difat != FreeSect && guard <= maxSector) {
        val s = readSector(difat)
        var j = 0
        while (j < perDifat) {
          val e = i32(s, 4 * j)
          if (e != FreeSect && e != EndOfChain) fatSectors += e
          j += 1
        }
        difat = i32(s, 4 * perDifat)
        guard += 1
      }
      require(guard <= maxSector, "DIFAT chain loops")
      fatSectors.iterator.flatMap { fs =>
        val s = readSector(fs)
        (0 until s.length / 4).iterator.map(j => i32(s, 4 * j))
      }.toArray
    }

    /** Follow a FAT chain, concatenating sectors, truncated to `size`. */
    private def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sect = start
      var hops = 0
      while (sect != EndOfChain && sect != FreeSect && out.size < size) {
        require(sect >= 0 && sect < fat.length, s"FAT chain sector $sect")
        require(hops <= fat.length, "FAT chain loops")
        out.write(readSector(sect))
        sect = fat(sect)
        hops += 1
      }
      require(out.size >= size, "stream shorter than directory size")
      java.util.Arrays.copyOfRange(out.toByteArray, 0, size.toInt)
    }

    // ---- directory (linear scan of the directory chain) ----
    /** (name, objectType, startSector, size) per live entry. */
    private val dir: Seq[(String, Int, Int, Long)] = {
      val raw = readChainUnsized(i32(bytes, 48))
      (0 until raw.length / 128).flatMap { k =>
        val off = 128 * k
        val nameLen = u16(raw, off + 64) // bytes incl the null terminator
        val tpe = raw(off + 66) & 0xFF
        if (tpe == 0 || nameLen < 2 || nameLen > 64) None
        else {
          val name = new String(raw, off, nameLen - 2,
            java.nio.charset.StandardCharsets.UTF_16LE)
          val start = i32(raw, off + 116)
          // v3 writers leave garbage in the high half of the 8-byte
          // size — the spec says to ignore it at 512 B sectors
          val size =
            if (sectorShift == 9) i32(raw, off + 120).toLong & 0xFFFFFFFFL
            else (i32(raw, off + 120).toLong & 0xFFFFFFFFL) |
              ((i32(raw, off + 124).toLong & 0xFFFFFFFFL) << 32)
          Some((name, tpe, start, size))
        }
      }
    }

    /** Chain read with no declared size (directory chains): stop at
      * end-of-chain. */
    private def readChainUnsized(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sect = start
      var hops = 0
      while (sect != EndOfChain && sect != FreeSect) {
        require(sect >= 0 && sect < fat.length, s"FAT chain sector $sect")
        require(hops <= fat.length, "FAT chain loops")
        out.write(readSector(sect))
        sect = fat(sect)
        hops += 1
      }
      out.toByteArray
    }

    // ---- mini stream (the root entry's payload, 64 B mini sectors) ----
    private lazy val root: (String, Int, Int, Long) = dir
      .find(_._2 == 5).getOrElse(
        throw new IllegalArgumentException("no root storage entry"))

    private lazy val miniStream: Array[Byte] =
      if (root._4 == 0) Array.emptyByteArray
      else readChain(root._3, root._4)

    private lazy val miniFat: Array[Int] = {
      val n = i32(bytes, 64) // number of mini-FAT sectors
      if (n == 0) Array.emptyIntArray
      else {
        val raw = readChainUnsized(i32(bytes, 60))
        (0 until raw.length / 4).map(j => i32(raw, 4 * j)).toArray
      }
    }

    private def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var sect = start
      var hops = 0
      while (sect != EndOfChain && sect != FreeSect && out.size < size) {
        require(sect >= 0 && sect < miniFat.length, s"mini chain sector $sect")
        require(hops <= miniFat.length, "mini-FAT chain loops")
        val off = sect * 64
        require(off + 64 <= miniStream.length, "mini sector out of range")
        out.write(miniStream, off, 64)
        sect = miniFat(sect)
        hops += 1
      }
      require(out.size >= size, "mini stream shorter than directory size")
      java.util.Arrays.copyOfRange(out.toByteArray, 0, size.toInt)
    }

    def streamNames: Seq[String] = dir.filter(_._2 == 2).map(_._1)

    /** The named stream's bytes (exact directory-declared size), or
      * None when absent. Streams under the cutoff live in the mini
      * stream; the root's own payload IS the mini-stream container. */
    def stream(name: String): Option[Array[Byte]] =
      dir.find(e => e._2 == 2 && e._1 == name).map { case (_, _, st, size) =>
        if (size == 0) Array.emptyByteArray
        else if (size < miniCutoff) readMiniChain(st, size)
        else readChain(st, size)
      }
  }

  def open(bytes: Array[Byte]): File = new File(bytes)
}
