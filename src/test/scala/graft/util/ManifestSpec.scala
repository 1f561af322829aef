package graft.util

import graft.SparkSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

class ManifestSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-manifest").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def writeRows(path: String, rows: Seq[(Long, String)],
                        mode: SaveMode): Unit =
    rows.toDF("id", "v").coalesce(1).write.mode(mode).parquet(s"$path/data")

  test("init commits generation 0 covering exactly the written files") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a"), (2L, "b")), SaveMode.Overwrite) }
    assert(Manifest.generations(spark, p) == Seq(0))
    val snap = Manifest.snapshot(spark, p)
    assert(snap.files.nonEmpty && snap.files.forall(_.startsWith("data/")))
    val got = Manifest.read(spark, p, "data").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  test("extend commits a new generation; reader snapshots are isolated") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a")), SaveMode.Overwrite) }
    assert(Manifest.extend(spark, p, Some("s1")) {
      writeRows(p, Seq((2L, "b")), SaveMode.Append)
    })
    assert(Manifest.generations(spark, p) == Seq(0, 1))
    // newest sees both; asOf 0 still sees only the build
    assert(Manifest.read(spark, p, "data").count() == 2)
    assert(Manifest.read(spark, p, "data", asOf = Some(0))
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
  }

  test("re-delivered shard id is a no-op and the write body never runs") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a")), SaveMode.Overwrite) }
    assert(Manifest.extend(spark, p, Some("s1")) {
      writeRows(p, Seq((2L, "b")), SaveMode.Append)
    })
    var ran = false
    assert(!Manifest.extend(spark, p, Some("s1")) { ran = true })
    assert(!ran)
    assert(Manifest.read(spark, p, "data").count() == 2)
    assert(Manifest.applied(spark, p) == Set("s1"))
  }

  test("uncommitted files are invisible to readers (mid-extend isolation)") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a")), SaveMode.Overwrite) }
    // simulate a crash mid-extend: data landed, no manifest commit
    writeRows(p, Seq((99L, "torn")), SaveMode.Append)
    assert(Manifest.read(spark, p, "data")
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    // the blind retry (proper extend) adopts ONLY its own files
    assert(Manifest.extend(spark, p, Some("s1")) {
      writeRows(p, Seq((2L, "b")), SaveMode.Append)
    })
    assert(Manifest.read(spark, p, "data")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // vacuum reclaims the orphan; committed data survives
    assert(Manifest.vacuum(spark, p) >= 1)
    assert(Manifest.read(spark, p, "data")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("empty-shard extend still records the ledger id") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a")), SaveMode.Overwrite) }
    assert(Manifest.extend(spark, p, Some("empty")) { () })
    assert(Manifest.applied(spark, p) == Set("empty"))
    assert(Manifest.read(spark, p, "data").count() == 1)
  }

  test("retire keeps the newest `retain` generations and their files") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((0L, "g0")), SaveMode.Overwrite) }
    (1 to 4).foreach { i =>
      Manifest.extend(spark, p, Some(s"s$i"), retain = 2) {
        writeRows(p, Seq((i.toLong, s"g$i")), SaveMode.Append)
      }
    }
    assert(Manifest.generations(spark, p) == Seq(3, 4))
    // newest still accumulates every committed row (append-only store)
    assert(Manifest.read(spark, p, "data").count() == 5)
    // a retired generation is no longer resolvable
    intercept[IllegalArgumentException] {
      Manifest.snapshot(spark, p, asOf = Some(0))
    }
  }

  test("init over a previous epoch clears stale manifests and ledger") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "old")), SaveMode.Overwrite) }
    Manifest.extend(spark, p, Some("batch-0")) {
      writeRows(p, Seq((2L, "old2")), SaveMode.Append)
    }
    Manifest.init(spark, p) { writeRows(p, Seq((7L, "new")), SaveMode.Overwrite) }
    assert(Manifest.generations(spark, p) == Seq(0))
    assert(Manifest.applied(spark, p).isEmpty)
    // the new epoch owes batch-0 a write — it must NOT be no-opped
    assert(Manifest.extend(spark, p, Some("batch-0")) {
      writeRows(p, Seq((8L, "new2")), SaveMode.Append)
    })
    assert(Manifest.read(spark, p, "data")
      .as[(Long, String)].collect().toSet == Set((7L, "new"), (8L, "new2")))
  }

  test("read surfaces partition directories as columns via basePath") {
    val p = tmp()
    Manifest.init(spark, p) {
      Seq((1L, 0), (2L, 1)).toDF("id", "cell")
        .write.partitionBy("cell").parquet(s"$p/codes")
    }
    val got = Manifest.read(spark, p, "codes")
    assert(got.columns.toSet == Set("id", "cell"))
    assert(got.select("cell").as[Int].collect().toSet == Set(0, 1))
  }

  test("empty sub-tree read falls back to schemaFrom's zero-row frame") {
    val p = tmp()
    Manifest.init(spark, p) { writeRows(p, Seq((1L, "a")), SaveMode.Overwrite) }
    val proto = Seq((0L, "x")).toDF("id", "v")
    val got = Manifest.read(spark, p, "nothing", schemaFrom = Some(proto))
    assert(got.columns.toSeq == Seq("id", "v") && got.count() == 0)
  }
}
