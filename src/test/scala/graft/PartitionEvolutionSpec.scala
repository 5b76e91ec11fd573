package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PARTITION EVOLUTION ([[PartitionEvolution]]): swap a table's layout
  * without touching history — new writes route by the new spec, old
  * files keep reading, time travel is exact — and migrate lazily with
  * `repartition_table` (which also heals root-landed CoW rewrites). */
class PartitionEvolutionSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_pevo_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_pev", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_pev.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_pev.lake")
    s
  }

  test("flat table evolves to partitioned: new writes route, history exact") {
    spark.sql("DROP TABLE IF EXISTS graft_pev.lake.e1")
    spark.sql("CREATE TABLE graft_pev.lake.e1 (region STRING, amount BIGINT)")
    spark.sql("INSERT INTO graft_pev.lake.e1 VALUES ('eu', 1), ('us', 2)")
    val dir = s"$warehouse/lake/e1"
    val res = spark.sql("CALL graft_pev.system.set_partition_spec(" +
      "table => 'lake.e1', spec => 'region')").collect()
    assert(res.head.getString(0) === "none" && res.head.getString(1) === "region")
    assert(ParquetVersions.enabled(dir), "evolution auto-upgrades to versioned")
    val vPre = ParquetVersions.latest(dir).get._1
    spark.sql("INSERT INTO graft_pev.lake.e1 VALUES ('eu', 10), ('ap', 100)")
    // new files landed partition-routed; old root files still read
    val names = ParquetVersions.latest(dir).get._2
    assert(names.exists(_.startsWith("region~eu/")), names)
    assert(names.exists(!_.contains("/")), s"old root files stay: $names")
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_pev.lake.e1")
      .head.getLong(0) === 113)
    // time travel to the pre-evolution membership is exact
    assert(spark.sql(
      s"SELECT sum(amount) AS s FROM graft_pev.lake.e1 VERSION AS OF $vPre")
      .head.getLong(0) === 3)

    // lazy migration: only the non-conforming (root) files rewrite
    val stats = spark.sql("CALL graft_pev.system.repartition_table(" +
      "table => 'lake.e1')").collect().head
    assert(stats.getLong(0) >= 1 && stats.getLong(1) === 2,
      s"only the two old rows migrate: $stats")
    val after = ParquetVersions.latest(dir).get._2
    assert(after.forall(_.contains("/")), s"all files conform now: $after")
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_pev.lake.e1")
      .head.getLong(0) === 113)
    // and the pre-migration snapshot still reads the retired root files
    assert(spark.sql(
      s"SELECT sum(amount) AS s FROM graft_pev.lake.e1 VERSION AS OF $vPre")
      .head.getLong(0) === 3)
    // second run is a no-op
    val again = spark.sql("CALL graft_pev.system.repartition_table(" +
      "table => 'lake.e1')").collect().head
    assert(again.getLong(0) === 0)
  }

  test("re-partitioning an already-partitioned table migrates between layouts") {
    spark.sql("DROP TABLE IF EXISTS graft_pev.lake.e2")
    spark.sql("""CREATE TABLE graft_pev.lake.e2 (region STRING, day DATE, amount BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_pev.lake.e2 VALUES
      ('eu', DATE'2024-01-01', 1), ('us', DATE'2024-01-02', 2),
      ('eu', DATE'2024-01-02', 4)""")
    val dir = s"$warehouse/lake/e2"
    spark.sql("CALL graft_pev.system.set_partition_spec(" +
      "table => 'lake.e2', spec => 'days(day)')")
    spark.sql("INSERT INTO graft_pev.lake.e2 VALUES ('ap', DATE'2024-01-03', 8)")
    val names = ParquetVersions.latest(dir).get._2
    assert(names.exists(_.startsWith("day~2024-01-03/")), names)
    assert(names.exists(_.startsWith("region~eu/")), s"old layout stays: $names")
    spark.sql("CALL graft_pev.system.repartition_table(table => 'lake.e2')")
    val after = ParquetVersions.latest(dir).get._2
    assert(after.forall(_.startsWith("day~")), s"migrated to day layout: $after")
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_pev.lake.e2")
      .head.getLong(0) === 15)
    // masked rows are not resurrected through migration
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_pev.lake.e2 WHERE amount = 4")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    spark.sql("CALL graft_pev.system.set_partition_spec(" +
      "table => 'lake.e2', spec => 'region')")
    spark.sql("CALL graft_pev.system.repartition_table(table => 'lake.e2')")
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_pev.lake.e2")
      .head.getLong(0) === 11, "the masked row must not come back")
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "migration consumed the masks with their files")
  }

  test("a crashed spec swap is read-repaired: readers prefer the .swap") {
    spark.sql("DROP TABLE IF EXISTS graft_pev.lake.e4")
    spark.sql("""CREATE TABLE graft_pev.lake.e4 (k BIGINT, v BIGINT)
                 PARTITIONED BY (k)""")
    val dir = s"$warehouse/lake/e4"
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate a replace() that crashed after writing the swap but
    // before the rename — the swap is the newer intended layout and
    // the table must NOT silently revert to the (deleted) old spec
    val swap = new org.apache.hadoop.fs.Path(dir, "_partition.json.swap")
    val out = fs.create(swap, true)
    out.write("""[{"col":"v","transform":"identity"}]""".getBytes)
    out.close()
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_partition.json"), false)
    val seen = PartitionSpecs.read(dir)
    assert(seen.exists(_.fields.map(_.col) === Seq("v")),
      s"readers must prefer the lingering swap: $seen")
    // new writes route by the swap's spec
    spark.sql("INSERT INTO graft_pev.lake.e4 VALUES (1, 7)")
    assert(ParquetVersions.latest(dir).get._2.exists(_.startsWith("v~7/")))
    // the next leased replace completes the swap physically
    spark.sql("CALL graft_pev.system.set_partition_spec(" +
      "table => 'lake.e4', spec => 'v')")
    assert(!fs.exists(swap), "the leased replace completes the swap")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_partition.json")))
  }

  test("clearing the spec flattens lazily; invalid specs are loud") {
    spark.sql("DROP TABLE IF EXISTS graft_pev.lake.e3")
    spark.sql("""CREATE TABLE graft_pev.lake.e3 (k BIGINT, v DOUBLE)
                 PARTITIONED BY (k)""")
    spark.sql("INSERT INTO graft_pev.lake.e3 VALUES (1, 0.5), (2, 1.5)")
    val dir = s"$warehouse/lake/e3"
    spark.sql("CALL graft_pev.system.set_partition_spec(" +
      "table => 'lake.e3', spec => 'none')")
    spark.sql("CALL graft_pev.system.repartition_table(table => 'lake.e3')")
    assert(ParquetVersions.latest(dir).get._2.forall(!_.contains("/")))
    assert(spark.table("graft_pev.lake.e3").count() === 2)
    val e1 = intercept[Exception] {
      spark.sql("CALL graft_pev.system.set_partition_spec(" +
        "table => 'lake.e3', spec => 'v')")
    }
    assert(e1.getMessage.contains("identity partitioning"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CALL graft_pev.system.set_partition_spec(" +
        "table => 'lake.e3', spec => 'nope')")
    }
    assert(e2.getMessage.contains("not in the table schema"), e2.getMessage)
  }
}
