package graft

import org.apache.spark.sql.functions._

import graft.pipeline.BloomIndex

class BloomIndexSpec extends SparkSpec {

  test("p_bloom_index returns one row per present probe key") {
    val rows = BloomIndex.pBloomIndex(spark, sfDir).collect()
    val expectedKeys = BloomIndex.probeKeys(spark, sfDir)
    assert(rows.map(_.getLong(0)).toSeq === expectedKeys.sorted)
    // the lookup answers match a direct full scan
    val full = Tables.lineitem(spark, sfDir)
      .withColumn("k", col("l_orderkey") * 8 + col("l_linenumber"))
      .filter(col("k").isInCollection(expectedKeys))
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(full(r.getLong(0)) === r.getLong(1)))
  }

  test("bloom pruning economics: min/max admits ~all files, bloom few") {
    val (_, manifest) = BloomIndex.ensureIndex(spark, sfDir)
    val files = manifest.count()
    assert(files === BloomIndex.Files.toLong)
    val keys = BloomIndex.probeKeys(spark, sfDir)
    // min/max footprint pruning on the uncorrelated key is useless:
    // every key's value sits inside (nearly) every file's [mn_k, mx_k]
    val minmaxAdmitted = manifest.filter(
      keys.map(k => col("mn_k") <= k && col("mx_k") >= k).reduce(_ || _)).count()
    assert(minmaxAdmitted >= files * 9 / 10,
      s"fixture drifted: min/max pruned to $minmaxAdmitted of $files — " +
        "the adversarial case no longer holds")
    // the bloom admits at most ~one file per present key (+ fpp slack)
    val admitted = BloomIndex.admittedFiles(manifest, keys)
    assert(admitted.nonEmpty)
    assert(admitted.size <= keys.size + 2,
      s"bloom admitted ${admitted.size} files for ${keys.size} keys")
    assert(admitted.size < minmaxAdmitted / 2)
  }

  test("absent keys are answered from the manifest alone (no file reads)") {
    val (_, manifest) = BloomIndex.ensureIndex(spark, sfDir)
    val maxK = manifest.agg(max("mx_k")).head().getLong(0)
    val absent = Seq(maxK + 11L, maxK + 22L, maxK + 33L)
    val admitted = BloomIndex.admittedFiles(manifest, absent)
    // fpp 0.001 over 64 files: expected false-positive admissions ~0.2
    assert(admitted.size <= 2,
      s"absent keys admitted ${admitted.size} files")
  }

  test("every admitted-file set is a superset of where the keys live") {
    // recall contract: a key's TRUE file must always be admitted
    val (dataPath, manifest) = BloomIndex.ensureIndex(spark, sfDir)
    val keys = BloomIndex.probeKeys(spark, sfDir)
    val admitted = BloomIndex.admittedFiles(manifest, keys).toSet
    val truth = spark.read.parquet(dataPath)
      .filter(col("k").isInCollection(keys))
      .select(regexp_extract(input_file_name(), "([^/]+)$", 1))
      .distinct().collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(admitted),
      s"missed files: ${truth -- admitted}")
  }
}
