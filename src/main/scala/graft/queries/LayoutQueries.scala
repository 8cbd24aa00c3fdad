package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables.cents
import graft.sources.Layout

/** Physical-layout catalog queries: prove the bucketed co-located join
  * and the partition-pruned scan END-TO-END (layout write → layout-aware
  * read → result), hash-verified against DuckDB running the equivalent
  * plain-parquet query. The interesting part is the PLAN (asserted in
  * LayoutSpec: no Exchange below the co-located join's aggregation;
  * PartitionFilters on the pruned scan) — the oracle proves the layout
  * round-trip loses nothing.
  */
object LayoutQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fact⋈fact revenue rollup on tables bucketed by order key: the join
    // shuffles NEITHER side (bucket co-location), the classic pre-paid
    // shuffle of a warehouse layout. Same result as the plain join.
    "q_colocated_join" -> ((s, dir) => {
      Layout.colocatedJoin(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // Skew-salted big⋈big join: hot keys split across salt sub-keys
    // (left) and replicated per salt (right), exactly reproducing the
    // plain inner join — the oracle proves semantics preservation; the
    // straggler-splitting efficiency claim is SkewJoinSpec's synthetic
    // skew test. Hot set auto-detected from a seeded sample, so the plan
    // is deterministic too.
    "q_salted_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").select(col("user_id"), col("value"))
      val cust = Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.SkewJoin
        .saltedJoin(ev, cust, "user_id", "c_custkey", nSalts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy(col("c_mktsegment"))
    }),

    // Range (band) join: orders placed within the closed 3-day window
    // after a same-nation urgent 1997 order. Spark plans the bare
    // BETWEEN condition as a nested loop; RangeJoin chunks the day axis
    // so the match is an equi-join on (nation, chunk) with the band as
    // a post-filter (RangeJoinSpec asserts no nested loop). Oracle is
    // the plain BETWEEN theta join.
    "q_range_join" -> ((s, dir) => {
      val cust = broadcast(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
      val nation = Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val base = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
        .join(cust, col("o_custkey") === col("c_custkey"))
      val urgent = base
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey").as("u_key"), col("c_nationkey").as("u_nat"),
          col("day").as("u_start"), (col("day") + 3).as("u_end"))
      val followers = base.select(col("o_orderkey").as("f_key"),
        col("c_nationkey").as("f_nat"), col("day").as("f_day"))
      graft.operators.RangeJoin.pointInInterval(
          followers, urgent, "f_day", "u_start", "u_end",
          chunkWidth = 4, keys = Seq(("f_nat", "u_nat")))
        .filter(col("f_key") =!= col("u_key"))
        .join(broadcast(nation), col("u_nat") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("f_key")).as("n_followers"))
        .orderBy(col("n_name"))
    }),

    // Box filter over the z-ordered events layout: both range predicates
    // reach the parquet reader and most row groups are skipped on
    // min/max stats (ZorderSpec quantifies the skip vs the unsorted
    // layout). Same result as filtering the original file — the oracle
    // proves the z-order round-trip is lossless.
    "e_zorder_scan" -> ((s, dir) => {
      s.read.parquet(Layout.eventsZordered(s, dir))
        .filter(col("user_id").between(100, 160) &&
          col("value") >= 50.0 && col("value") < 80.0)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_c"))
    }),

    // Pruned scan over the type-partitioned events layout: the filter is
    // a directory listing, not a row filter — only the 'click' partition
    // is ever read. Same result as filtering the unpartitioned file.
    "e_pruned_type" -> ((s, dir) => {
      s.read.parquet(Layout.eventsByType(s, dir))
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_c"))
    }),

    // JSONL ingestion round-trip END-TO-END through real files: the
    // documents table written as line-delimited JSON (codegen'd
    // to_json), three guaranteed-corrupt lines appended, read back by
    // the schema-explicit reader with malformed lines dropped. The
    // oracle reads the parquet directly, so a hash match proves (a)
    // parse(serialize(x)) == x for every row and field, and (b) not
    // one corrupt line leaked into the good split. Quarantine counts
    // and the CSV twin are IngestSpec's.
    "s_jsonl_roundtrip" -> ((s, dir) => {
      import graft.sources.Ingest
      val path = Ingest.documentsJsonlMirror(s, dir)
      Ingest.readJsonl(s, path, Ingest.DocumentsSchema)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // CSV ingestion round-trip END-TO-END through real files — the
    // fourth text/interchange format of the estate: the customer table
    // dumped as headered CSV (codegen'd to_csv), three guaranteed-
    // corrupt lines appended, read back by the schema-explicit
    // splittable reader with header lines skipped structurally and
    // malformed lines quarantined. The oracle reads the parquet, so a
    // hash match proves parse(serialize(x)) == x for every row
    // (including exact double round-trip of c_acctbal) and that neither
    // a header nor a corrupt line leaked into the good split.
    "s_csv_roundtrip" -> ((s, dir) => {
      import graft.sources.Ingest
      val path = Ingest.customerCsvMirror(s, dir)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
          "c_acctbal DOUBLE, c_mktsegment STRING")
      Ingest.readCsv(s, path, schema)
        .orderBy(col("c_custkey"))
    }),

    // Avro round-trip END-TO-END through real container files — the
    // third interchange format of the estate, served by OUR
    // avro-mapred-based source (the spark-avro connector is not a
    // dependency): supplier written as Avro and read back with the
    // explicit reader schema, vs the oracle on the parquet. Hash match
    // proves write+read lossless; reuse-safety and per-type coverage
    // are AvroSpec's.
    "s_avro_roundtrip" -> ((s, dir) => {
      val path = graft.sources.Avro.supplierAvroMirror(s, dir)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
      graft.sources.Avro.read(s, path, schema)
        .orderBy(col("s_suppkey"))
    }),

    // Message-bus payload decode: every supplier row encoded to
    // single-record Avro bytes (the Kafka-value shape) and decoded back
    // INLINE in the plan by the avro_decode expression — no UDF, no
    // connector. Hash match vs the parquet oracle proves the
    // encode -> binary column -> expression-decode chain is lossless;
    // poisoned-payload null-routing is AvroSpec's.
    "s_avro_messages" -> ((s, dir) => {
      import graft.functions.AvroFunctions
      val sup = s.read.parquet(s"$dir/supplier.parquet")
      val schemaJson = graft.sources.Avro.avroSchemaFor(sup.schema).toString
      AvroFunctions.encodeMessages(sup)
        .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
        .select(col("m.*"))
        .orderBy(col("s_suppkey"))
    }),

    // Vector round-trip through the Avro layer — the engine's own
    // native column type (embedding: array<float>) through its own
    // container format: embeddings written as Avro (array-of-float
    // fields as Avro arrays) and read back, every element pinned by a
    // position-weighted integer digest vs the parquet oracle. A hash
    // match proves element values AND order AND length survive; a
    // dropped, reordered, or truncated element shifts the digest.
    "s_avro_embeddings" -> ((s, dir) => {
      val path = graft.sources.Avro.embeddingsAvroMirror(s, dir)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      graft.sources.Avro.read(s, path, schema)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("p0", "x")))
        .groupBy(col("vec_id"), col("label"))
        .agg(count(lit(1)).as("dim"),
          sum(floor(col("x").cast("double") * lit(1000000L)).cast("long")
            * (col("p0") + 1)).as("digest"))
        .orderBy(col("vec_id"))
    }),

    // Embeddings over the message bus: each embeddings row encoded to
    // single-record Avro bytes and decoded back INLINE by avro_decode
    // (array-carrying payloads — the shape a training-data pipeline
    // actually ingests from Kafka), digested as above vs the same
    // parquet oracle.
    "s_avro_vec_messages" -> ((s, dir) => {
      import graft.functions.AvroFunctions
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val schemaJson = graft.sources.Avro.avroSchemaFor(emb.schema).toString
      AvroFunctions.encodeMessages(emb)
        .select(AvroFunctions.avroDecode(col("payload"), schemaJson).as("m"))
        .select(col("m.vec_id").as("vec_id"), col("m.label").as("label"),
          posexplode(col("m.embedding")).as(Seq("p0", "x")))
        .groupBy(col("vec_id"), col("label"))
        .agg(count(lit(1)).as("dim"),
          sum(floor(col("x").cast("double") * lit(1000000L)).cast("long")
            * (col("p0") + 1)).as("digest"))
        .orderBy(col("vec_id"))
    }),

    // Nested-struct round-trip through the Avro layer: orders rows
    // packed as (o_orderkey, meta: struct<priority, status, total_c>),
    // written as Avro (nested named record), read back and FLATTENED —
    // vs the oracle reading the plain parquet columns. Flattening on
    // the Spark side keeps the hash compare scalar (struct stringify
    // differs across engines); the values proving the nested path are
    // identical either way.
    "s_avro_nested" -> ((s, dir) => {
      val path = graft.sources.Avro.ordersNestedAvroMirror(s, dir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("meta",
          org.apache.spark.sql.types.StructType.fromDDL(
            "priority STRING, status STRING, total_c BIGINT"))))
      graft.sources.Avro.read(s, path, schema)
        .select(col("o_orderkey"), col("meta.priority").as("priority"),
          col("meta.status").as("status"), col("meta.total_c").as("total_c"))
        .orderBy(col("o_orderkey"))
    }),

    // Dynamic partition pruning over the type-partitioned events
    // layout: the pruning predicate is NOT statically known — it comes
    // from a joined dimension's filter (priority = 1), so Catalyst
    // inserts a DynamicPruningSubquery that broadcasts the dim first
    // and prunes the fact's partition listing at RUNTIME. At 100 TB
    // this is THE warehouse join shape (fact partitioned by date/type,
    // dim filtered by the query) — static pruning can't see through
    // the join, DPP skips the unneeded partitions anyway. LayoutSpec
    // asserts dynamicpruningexpression in the scan; the oracle inlines
    // the dim as VALUES, so the hash proves semantics.
    "e_dpp_join" -> ((s, dir) => {
      val dim = s.read.parquet(Layout.priorityDim(s))
      s.read.parquet(Layout.eventsByType(s, dir))
        .join(broadcast(dim.filter(col("priority") === 1)),
          col("event_type") === col("t"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_c"))
        .orderBy(col("event_type"))
    }),

    // Small-files compaction END-TO-END: events deliberately shattered
    // into 64 tiny shards (the post-streaming-ingest layout), compacted
    // back to byte-sized-from-disk file counts, then aggregated — vs
    // the oracle on the ORIGINAL table, so a hash match proves the
    // fragment -> compact chain loses nothing. The file-count and
    // size-uniformity claims are LayoutSpec's; this row is the data
    // fidelity proof.
    "s_compact_scan" -> ((s, dir) => {
      val compacted = Layout.compactedFragmentedEvents(s, dir,
        targetBytes = 4L * 1024 * 1024)
      s.read.parquet(compacted)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_c"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))
        .orderBy(col("event_type"))
    }),

    // ORC round-trip END-TO-END through real files: the part table
    // written as ORC by Spark's built-in source and read back, vs the
    // oracle reading the original parquet. A hash match proves the
    // second columnar format in the estate (Hive-side ORC) is a
    // lossless citizen across bigint/varchar/int/double. The pushdown
    // posture (PushedFilters into the ORC scan) is IngestSpec's plan
    // assertion; this row is the data fidelity proof.
    "s_orc_roundtrip" -> ((s, dir) => {
      val path = graft.sources.Ingest.partOrcMirror(s, dir)
      s.read.orc(path)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_colocated_join" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q_range_join" ->
      """WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
        |u AS (SELECT o_orderkey AS u_key, c_nationkey AS u_nat, o_orderdate AS u_date
        |      FROM orders JOIN c ON o_custkey = c_custkey
        |      WHERE o_orderpriority = '1-URGENT'
        |        AND o_orderdate >= TIMESTAMP '1997-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01'),
        |f AS (SELECT o_orderkey AS f_key, c_nationkey AS f_nat, o_orderdate AS f_date
        |      FROM orders JOIN c ON o_custkey = c_custkey)
        |SELECT n_name, count(*) AS n_pairs,
        |  CAST(count(DISTINCT f_key) AS BIGINT) AS n_followers
        |FROM f JOIN u
        |  ON f_nat = u_nat
        | AND f_date BETWEEN u_date AND u_date + INTERVAL 3 DAY
        | AND f_key != u_key
        |JOIN nation ON u_nat = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "e_pruned_type" ->
      """SELECT count(*) AS n,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events WHERE event_type = 'click'""".stripMargin,

    "e_zorder_scan" ->
      """SELECT count(*) AS n,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events
        |WHERE user_id BETWEEN 100 AND 160 AND value >= 50.0 AND value < 80.0""".stripMargin,

    // the oracle never sees the JSONL bytes (the media-decode oracle
    // rule): reading the parquet directly is the ground truth the
    // serialize -> file -> parse chain must reproduce bit-for-bit
    "s_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "s_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "s_orc_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,

    "s_avro_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    // the oracle never sees the Avro bytes: it digests the PARQUET
    // embeddings with the same position-weighted integer formula (both
    // sides quantize identical float->double-exact values in identical
    // order, so the integer arithmetic is bit-for-bit)
    "s_avro_embeddings" ->
      """SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
        | CAST((SELECT sum(CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT) * p)
        |   FROM (SELECT unnest(embedding) AS x,
        |                generate_subscripts(embedding, 1) AS p)) AS BIGINT) AS digest
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "s_avro_vec_messages" ->
      """SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
        | CAST((SELECT sum(CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT) * p)
        |   FROM (SELECT unnest(embedding) AS x,
        |                generate_subscripts(embedding, 1) AS p)) AS BIGINT) AS digest
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "s_avro_nested" ->
      """SELECT o_orderkey, o_orderpriority AS priority, o_orderstatus AS status,
        | CAST(floor(o_totalprice*100) AS BIGINT) AS total_c
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the oracle never sees the payload bytes (the media-decode rule)
    "s_avro_messages" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "s_compact_scan" ->
      """SELECT event_type, count(*) AS n,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c,
        | min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e_dpp_join" ->
      """WITH dim(t, priority) AS (VALUES ('click', 1), ('purchase', 1),
        |  ('view', 0), ('signup', 0), ('error', 0))
        |SELECT event_type, count(*) AS n,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events JOIN dim ON event_type = t AND priority = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
