package graft

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Cfb, DocExtractor, DocLoader, PptExtractor}

/** Builds REAL v3 CFB containers (512 B sectors, FAT + directory +
  * mini-FAT + mini stream) so the .doc/.ppt extractors are tested
  * against the genuine on-disk layout: streams under the 4096 B
  * cutoff land in the mini stream, larger ones in regular FAT chains.
  */
class CfbSpec extends AnyFunSuite {

  // ---------- test-side CFB writer ----------

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF
  private val FatSect = 0xFFFFFFFD

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte
    b(off + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def pad(n: Int, to: Int): Int = (n + to - 1) / to * to

  /** A v3 compound file holding the given streams. */
  def cfb(streams: (String, Array[Byte])*): Array[Byte] = {
    val cutoff = 4096
    val minis = streams.filter(_._2.length < cutoff)
    val bigs = streams.filter(_._2.length >= cutoff)

    // mini-stream container: each mini stream padded to 64 B sectors
    val miniContainer = new ByteArrayOutputStream()
    val miniStart = scala.collection.mutable.Map.empty[String, Int]
    val miniFat = scala.collection.mutable.ArrayBuffer.empty[Int]
    minis.foreach { case (name, data) =>
      miniStart(name) = miniFat.length
      val sectors = math.max(1, pad(data.length, 64) / 64)
      (1 until sectors).foreach(k => miniFat += miniFat.length + 1)
      miniFat += EndOfChain
      miniContainer.write(data)
      miniContainer.write(new Array[Byte](pad(data.length, 64) - data.length))
    }
    val miniBytes = miniContainer.toByteArray

    // regular sector counts (FAT count found by fixpoint)
    val dirSectors = pad(128 * (1 + streams.length), 512) / 512
    val miniFatSectors = if (miniFat.isEmpty) 0 else pad(4 * miniFat.length, 512) / 512
    val miniContSectors = pad(miniBytes.length, 512) / 512
    val bigSectors = bigs.map(b => pad(b._2.length, 512) / 512)
    val payload = dirSectors + miniFatSectors + miniContSectors + bigSectors.sum
    var fatSectors = 1
    while (128 * fatSectors < fatSectors + payload) fatSectors += 1
    val total = fatSectors + payload

    // sector index assignment, in file order
    val dirStart = fatSectors
    val miniFatStart = dirStart + dirSectors
    val miniContStart = miniFatStart + miniFatSectors
    var next = miniContStart + miniContSectors
    val bigStart = bigs.map { case (name, data) =>
      val s = next; next += pad(data.length, 512) / 512; name -> s
    }.toMap

    // FAT
    val fat = Array.fill(128 * fatSectors)(FreeSect)
    (0 until fatSectors).foreach(i => fat(i) = FatSect)
    def chain(start: Int, n: Int): Unit = {
      (0 until n - 1).foreach(i => fat(start + i) = start + i + 1)
      if (n > 0) fat(start + n - 1) = EndOfChain
    }
    chain(dirStart, dirSectors)
    chain(miniFatStart, miniFatSectors)
    chain(miniContStart, miniContSectors)
    bigs.foreach { case (name, data) =>
      chain(bigStart(name), pad(data.length, 512) / 512)
    }

    // directory: root first, then one entry per stream
    def entry(name: String, tpe: Int, start: Int, size: Long): Array[Byte] = {
      val e = new Array[Byte](128)
      val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      System.arraycopy(utf16, 0, e, 0, utf16.length)
      putU16(e, 64, utf16.length + 2)
      e(66) = tpe.toByte
      putI32(e, 68, FreeSect); putI32(e, 72, FreeSect); putI32(e, 76, FreeSect)
      putI32(e, 116, start)
      putI32(e, 120, (size & 0xFFFFFFFFL).toInt)
      e
    }
    val dir = new ByteArrayOutputStream()
    dir.write(entry("Root Entry", 5,
      if (miniBytes.isEmpty) EndOfChain else miniContStart, miniBytes.length))
    streams.foreach { case (name, data) =>
      val start =
        if (data.length < cutoff) miniStart(name) else bigStart(name)
      dir.write(entry(name, 2, start, data.length))
    }
    dir.write(new Array[Byte](512 * dirSectors - dir.size))

    // header
    val header = new Array[Byte](512)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
      .foreach { case (v, i) => header(i) = v.toByte }
    putU16(header, 24, 0x003E)   // minor
    putU16(header, 26, 0x0003)   // major: v3
    putU16(header, 28, 0xFFFE)   // little-endian marker
    putU16(header, 30, 9)        // 512 B sectors
    putU16(header, 32, 6)        // 64 B mini sectors
    putI32(header, 44, fatSectors)
    putI32(header, 48, dirStart)
    putI32(header, 56, cutoff)
    putI32(header, 60, if (miniFatSectors == 0) EndOfChain else miniFatStart)
    putI32(header, 64, miniFatSectors)
    putI32(header, 68, EndOfChain) // no DIFAT chain
    putI32(header, 72, 0)
    (0 until 109).foreach { i =>
      putI32(header, 76 + 4 * i, if (i < fatSectors) i else FreeSect)
    }

    val out = new ByteArrayOutputStream()
    out.write(header)
    (0 until fatSectors).foreach { fs =>
      val sect = new Array[Byte](512)
      (0 until 128).foreach(j => putI32(sect, 4 * j, fat(128 * fs + j)))
      out.write(sect)
    }
    out.write(dir.toByteArray)
    if (miniFatSectors > 0) {
      val mf = new Array[Byte](512 * miniFatSectors)
      java.util.Arrays.fill(mf, 0xFF.toByte) // FREESECT padding
      miniFat.zipWithIndex.foreach { case (v, i) => putI32(mf, 4 * i, v) }
      out.write(mf)
    }
    out.write(miniBytes)
    out.write(new Array[Byte](512 * miniContSectors - miniBytes.length))
    bigs.foreach { case (_, data) =>
      out.write(data)
      out.write(new Array[Byte](pad(data.length, 512) - data.length))
    }
    assert(out.size == 512 * (1 + total))
    out.toByteArray
  }

  // ---------- .doc fixture ----------

  /** WordDocument + 1Table streams: two pieces (CP1252 + UTF-16LE),
    * a Prc block in front of the Pcdt, field instructions, and a cell
    * mark — the structures DocExtractor must handle. */
  private def wordFile(): Array[Byte] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // piece 1, compressed: para mark + field (instruction dropped,
    // result kept) + cell mark — control bytes assembled explicitly
    // (scalac would consume \u escapes even in raw strings)
    val t1 = "Hello from Word.\r" +
      0x13.toChar + " HYPERLINK x " + 0x14.toChar + "linked" +
      0x15.toChar + " cell" + 0x07.toChar + "done\r"
    // piece 2, unicode
    val t2 = "Zweite Hälfte — unicode.\r"
    val wd = new Array[Byte](2048)
    putU16(wd, 0, 0xA5EC)
    putU16(wd, 0x0A, 0x0200) // fWhichTblStm -> 1Table
    val b1 = t1.getBytes(cp1252)
    val off1 = 0x400
    System.arraycopy(b1, 0, wd, off1, b1.length)
    val b2 = t2.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val off2 = 0x500
    System.arraycopy(b2, 0, wd, off2, b2.length)

    // Clx in 1Table: one Prc (skipped) then the Pcdt
    val prc = Array[Byte](0x01, 0x02, 0x00, 0x7F, 0x7F) // [01][cb=2][2 bytes]
    val n = 2
    val plcLen = 4 * (n + 1) + 8 * n
    val pcdt = new Array[Byte](5 + plcLen)
    pcdt(0) = 0x02
    putI32(pcdt, 1, plcLen)
    putI32(pcdt, 5, 0)                       // cp0
    putI32(pcdt, 9, t1.length)               // cp1
    putI32(pcdt, 13, t1.length + t2.length)  // cp2
    putI32(pcdt, 17 + 2, 0x40000000 | (off1 * 2)) // pcd1.fc: compressed
    putI32(pcdt, 25 + 2, off2)                    // pcd2.fc: unicode
    val clx = prc ++ pcdt
    putI32(wd, 0x01A2, 0)          // fcClx
    putI32(wd, 0x01A6, clx.length) // lcbClx
    cfb("WordDocument" -> wd, "1Table" -> clx)
  }

  // ---------- .ppt fixture ----------

  private def record(verInst: Int, recType: Int, body: Array[Byte]): Array[Byte] = {
    val r = new Array[Byte](8 + body.length)
    putU16(r, 0, verInst); putU16(r, 2, recType); putI32(r, 4, body.length)
    System.arraycopy(body, 0, r, 8, body.length)
    r
  }

  private def pptFile(): Array[Byte] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val slideList = record(0x000F, 0x0FF0, // SlideListWithText container
      record(0x0000, 0x03F3, new Array[Byte](20)) ++ // SlidePersistAtom
        record(0x0000, 0x0FA8, // TextBytesAtom
          "First slide\rwith a bullet".getBytes(cp1252)) ++
        record(0x0000, 0x03F3, new Array[Byte](20)) ++
        record(0x0000, 0x0FA0, // TextCharsAtom
          "Zweite Folie — ok".getBytes(
            java.nio.charset.StandardCharsets.UTF_16LE)))
    // pad the stream past the mini cutoff so it takes the regular FAT
    // path (WordDocument above exercises the mini path)
    val padAtom = record(0x0000, 0x0BAD, new Array[Byte](4200))
    cfb("PowerPoint Document" -> (slideList ++ padAtom),
      "Current User" -> Array[Byte](1, 2, 3))
  }

  // ---------- tests ----------

  test("CFB reader: mini and regular stream round-trips") {
    val small = "tiny payload".getBytes("UTF-8")           // mini path
    val big = Array.tabulate[Byte](5000)(i => (i % 251).toByte) // FAT path
    val f = Cfb.open(cfb("small" -> small, "big" -> big))
    assert(f.streamNames.toSet == Set("small", "big"))
    assert(f.stream("small").get.toSeq == small.toSeq)
    assert(f.stream("big").get.toSeq == big.toSeq)
    assert(f.stream("absent").isEmpty)
  }

  test("CFB reader: throws on garbage, not a crash path") {
    intercept[IllegalArgumentException](Cfb.open(new Array[Byte](16)))
    intercept[IllegalArgumentException](
      Cfb.open(Array.fill[Byte](600)(0x42)))
  }

  test("DOC extractor: piece table, CP1252 + unicode, fields, cell marks") {
    val text = DocExtractor.extract(wordFile())
    assert(text.contains("Hello from Word."))
    assert(text.contains("Zweite Hälfte — unicode."))
    // the field's instruction half is dropped, its result kept
    assert(text.contains("linked"))
    assert(!text.contains("HYPERLINK"))
    // cell mark becomes a tab
    assert(text.contains("cell\tdone"))
  }

  test("DOC extractor: pre-97 fcMin/fcMax fallback, 8- and 16-bit") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    def fib(flags: Int, body: Array[Byte]): Array[Byte] = {
      val wd = new Array[Byte](0x600)
      putU16(wd, 0, 0xA5EC)
      putU16(wd, 0x0A, flags)
      putI32(wd, 0x18, 0x400)               // fcMin
      putI32(wd, 0x1C, 0x400 + body.length) // fcMax
      System.arraycopy(body, 0, wd, 0x400, body.length)
      wd
    }
    val eight = cfb("WordDocument" ->
      fib(0x0000, "plain old text\r".getBytes(cp1252)))
    assert(DocExtractor.extract(eight) == "plain old text")
    val sixteen = cfb("WordDocument" ->
      fib(0x1000, "wide — text\r".getBytes(
        java.nio.charset.StandardCharsets.UTF_16LE)))
    assert(DocExtractor.extract(sixteen) == "wide — text")
  }

  test("DOC extractor: encrypted and non-Word payloads throw") {
    val wd = new Array[Byte](0x200)
    putU16(wd, 0, 0xA5EC); putU16(wd, 0x0A, 0x0100) // fEncrypted
    intercept[IllegalArgumentException](
      DocExtractor.extract(cfb("WordDocument" -> wd)))
    intercept[IllegalArgumentException](
      DocExtractor.extract(cfb("SomeOtherStream" -> new Array[Byte](64))))
  }

  test("PPT extractor: slides from SlideListWithText, bytes + chars atoms") {
    val pages = PptExtractor.extractPages(pptFile())
    assert(pages == Seq("First slide\nwith a bullet", "Zweite Folie — ok"))
    assert(PptExtractor.extract(pptFile()) ==
      "First slide\nwith a bullet\n\nZweite Folie — ok")
  }

  test("DocLoader loads real .doc and .ppt; malformed .doc degrades") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-cfb")
    Files.write(dir.resolve("memo.doc"), wordFile())
    Files.write(dir.resolve("deck.ppt"), pptFile())
    Files.write(dir.resolve("junk.doc"), "not a compound file".getBytes)
    val rows = DocLoader.load(spark, dir.toString).collect()
      .map(r => (r.getAs[String]("source").split('/').last,
        r.getAs[Long]("page"), r.getAs[String]("text")))
    assert(rows.collect { case ("memo.doc", 0L, t) => t }.head
      .contains("Hello from Word."))
    // ppt slides are pages, like pdf streams / pptx slides
    assert(rows.collect { case ("deck.ppt", p, t) => (p, t) }.sorted.toSeq == Seq(
      0L -> "First slide\nwith a bullet", 1L -> "Zweite Folie — ok"))
    assert(rows.collect { case ("junk.doc", 0L, t) => t }.head ==
      "[unparsed doc document, 19 bytes]")
  }
}
