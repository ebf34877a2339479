"""Extension-operator registry: LLM-training-data-pipeline queries
(dedup, similarity search, text analysis, JSON, windows, streaming
sessionization, multimodal) — SURVEY.md §7 phase E / BASELINE.json
north star.

Same determinism rules as registry.py. Every query here carries a
DuckDB oracle: even the hash/LSH paths are differential-checked by
construction — MinHash carries an exact-Jaccard verify, SimHash runs
its portable md5-hash mode, IVF's centroid pick is salted-md5
deterministic, and RH-LSH's seeded hyperplanes are inlined into the
oracle SQL as double literals (repr round-trips exactly). The float
cosine fold was verified bit-identical between Spark's ``aggregate``/
``zip_with`` and DuckDB's ``list_reduce``/``list_transform`` (both
strict left folds in double).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .functions.math import dec_sum
from .multimodal.binary import attach_binary_payload, binary_metadata
from .operators import kmeans, neardup, similarity
from .operators.dedupe import keep_latest
from .plans.silver import silver_events, silver_orders
from .registry import _t, query
from .streaming.sessions import session_rollup
from .streaming.stateful import run_stateful_sessions_bounded

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "ext_text_stats",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      list_reduce(list_transform(toks, s -> CAST(length(s) AS DOUBLE)), (a,b) -> a+b) / len(toks) AS avg_token_len,
      CAST(len(list_filter(toks, s -> list_contains(['the','a','of','and','to','in','is'], s))) AS DOUBLE) / len(toks) AS stopword_ratio,
      LEAST(1.0, len(toks) / 100.0) * 0.4
        + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.3
        + LEAST(1.0, (CAST(len(list_filter(toks, s -> list_contains(['the','a','of','and','to','in','is'], s))) AS DOUBLE) / len(toks)) * 5.0) * 0.3
        AS quality_score
    FROM t
    """,
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical-diversity + quality scoring, all via
    JVM-side higher-order functions (no UDF)."""
    docs = _t(spark, sf_dir, "documents")
    txt = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(txt).alias("n_tokens"),
        T.distinct_token_count(txt).alias("n_distinct"),
        T.avg_token_len(txt).alias("avg_token_len"),
        T.stopword_ratio(txt).alias("stopword_ratio"),
        T.quality_score(txt).alias("quality_score"),
    )


# Oracle fragments live in functions/text.py (dependency-free) so
# registry_round4 can splice them without importing this module.
_RATIOS = T.LANGID_RATIOS_SQL

@query(
    "ext_text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    r AS (
      SELECT doc_id, lang,
        {_RATIOS['en']} AS r_en, {_RATIOS['es']} AS r_es,
        {_RATIOS['fr']} AS r_fr, {_RATIOS['de']} AS r_de
      FROM t
    )
    SELECT doc_id, lang,
      CASE
        WHEN r_en > 0 AND r_en = GREATEST(r_en, r_es, r_fr, r_de) THEN 'en'
        WHEN r_es > 0 AND r_es = GREATEST(r_en, r_es, r_fr, r_de) THEN 'es'
        WHEN r_fr > 0 AND r_fr = GREATEST(r_en, r_es, r_fr, r_de) THEN 'fr'
        WHEN r_de > 0 AND r_de = GREATEST(r_en, r_es, r_fr, r_de) THEN 'de'
        ELSE 'und' END AS predicted_lang
    FROM r
    """,
)
def ext_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID next to the labeled lang column."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", T.langid(F.col("text")).alias("predicted_lang"))


@query(
    "ext_text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
      list_reduce(
        list_concat([CAST(0 AS BIGINT)],
          list_transform(toks, s ->
            (CAST(length(s) AS BIGINT) * 31 + ascii(s[1]) * 7 + ascii(s[-1])) % 2147483647)),
        (acc, w) -> (acc * 1000003 + w) % 2147483647
      ) AS fingerprint
    FROM t
    """,
)
def ext_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (engine-
    portable integer arithmetic, no native hash function)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.token_fingerprint(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# JSON extraction (events.props)
# ---------------------------------------------------------------------------

@query(
    "ext_json_extract",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS k_avg,
      COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def ext_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the clickstream props column + rollup
    (north-star JSON surface, SURVEY.md §2.8 note)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Multimodal binary plumbing (pure-SQL metadata path)
# ---------------------------------------------------------------------------

@query(
    "ext_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      sha256(text) AS content_sha256
    FROM documents
    """,
)
def ext_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (length + sha256) without decoding —
    column pruning keeps payload scans out of metadata queries."""
    docs = _t(spark, sf_dir, "documents")
    return binary_metadata(attach_binary_payload(docs))


# PCM hex chain for the real-WAVE frame query: 256 samples = 512 PCM
# bytes = 32 md5 blocks per document, mirrored verbatim in the oracle.
_WAV_ORACLE_BLOCKS = " || ".join(
    f"md5(CAST(doc_id AS VARCHAR) || ':wav{i}')" for i in range(32)
)


@query(
    "ext_media_frames",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, {_WAV_ORACLE_BLOCKS} AS pcm_hex
      FROM documents
    ), fx AS (
      SELECT media_id, pcm_hex, unnest(range(0, 16, 4)) AS f
      FROM m
    )
    SELECT media_id, CAST(f AS BIGINT) AS frame_idx,
      upper(substring(pcm_hex, CAST(f AS BIGINT) * 64 + 1, 64)) AS frame_hex
    FROM fx
    """,
)
def ext_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end (``fake=False``): build a genuine
    RIFF/WAVE mono PCM16 payload per document JVM-side (md5-chain
    sample bytes under the canonical header — attach_wave_payload),
    then run the real chunk-walking decode → every-4th-16-sample
    window sampler (multimodal/binary.sample_frames, RIFF spec
    implemented honestly) through Arrow mapInPandas: 1 audio row fans
    out to 4 frame rows, output cardinality decoupled from input.
    Byte-exact: little-endian int16 windows round-trip to the exact
    PCM bytes, so the oracle replays each frame as a 64-hex-char
    substring of the same md5 chain — header parse, chunk walk, and
    window math all sit on the checked path with genuine samples."""
    docs = _t(spark, sf_dir, "documents")
    from .multimodal.binary import attach_wave_payload, sample_frames

    media = attach_wave_payload(docs, n_samples=256)
    frames = sample_frames(media, every_n=4, max_frames=8, fake=False)
    return frames.select(
        "media_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


@query(
    "ext_media_phash_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS len
      FROM documents
    ),
    bytes AS (
      SELECT media_id,
        (strpos('0123456789ABCDEF',
                substring(h, CAST(i AS BIGINT) * 2 + 1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF',
                    substring(h, CAST(i AS BIGINT) * 2 + 2, 1)) - 1) AS val,
        len
      FROM m, unnest(range(0, len)) AS u(i)
    ),
    bins AS (
      SELECT media_id, len, val % 48 AS bin, COUNT(*) AS cnt
      FROM bytes GROUP BY 1, 2, 3
    ),
    ph AS (
      SELECT media_id,
        CAST(SUM(CASE WHEN 48 * cnt > len
                 THEN CAST(1 AS BIGINT) << bin ELSE 0 END) AS BIGINT) AS phash
      FROM bins GROUP BY 1
    ),
    hashed AS (
      SELECT m.media_id, COALESCE(p.phash, 0) AS phash
      FROM m LEFT JOIN ph p USING (media_id)
    )
    SELECT media_id, phash,
      MIN(media_id) OVER (PARTITION BY phash) AS canonical_media_id,
      media_id != MIN(media_id) OVER (PARTITION BY phash) AS is_duplicate,
      COUNT(*) OVER (PARTITION BY phash) AS group_size
    FROM hashed
    """,
)
def ext_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup by perceptual hash — the standard first pass of
    multimodal corpus curation: fingerprint every image
    (multimodal/binary.media_phash, deterministic stand-in codec
    through the real Arrow plumbing), then one JVM groupBy(phash)
    assigns each media row its canonical (min-id) representative and
    duplicate flag. Equality buckets scale as a plain hash aggregate;
    Hamming-distance near-dup reuses the SimHash banding idiom on the
    phash column when re-encode tolerance is needed. Bit-exact
    cross-engine: the hash uses only integer comparisons, replayed by
    the oracle in the hex domain."""
    docs = _t(spark, sf_dir, "documents")
    from .multimodal.binary import media_phash

    ph = media_phash(attach_binary_payload(docs), fake=True)
    w = Window.partitionBy("phash")
    canonical = F.min("media_id").over(w)
    return ph.select(
        "media_id",
        "phash",
        canonical.alias("canonical_media_id"),
        (F.col("media_id") != canonical).alias("is_duplicate"),
        F.count(F.lit(1)).over(w).alias("group_size"),
    )


# src-index map for the 12×8 → 5×3 exact nearest-neighbor resample:
# dst (x, y) ← src (⌊x·12/5⌋, ⌊y·8/3⌋); flat index y·12+x. Fixed dims
# → a compile-time constant the oracle replays as byte picks.
_PGM_RESIZE_IDX = [
    y * 12 + x
    for y in ((yy * 8) // 3 for yy in range(3))
    for x in ((xx * 12) // 5 for xx in range(5))
]
_PGM_OUT_HEADER_HEX = "P5\n5 3\n255\n".encode().hex().upper()
_PGM_ORACLE_PICKS = " || ".join(
    f"substring(pix, {i * 2 + 1}, 2)" for i in _PGM_RESIZE_IDX
)
_PGM_ORACLE_BLOCKS = " || ".join(
    f"md5(CAST(doc_id AS VARCHAR) || ':pgm{i}')" for i in range(6)
)


@query(
    "ext_media_ppm_resize",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, {_PGM_ORACLE_BLOCKS} AS pix
      FROM documents
    )
    SELECT media_id, 'image' AS media_type,
      CAST(5 AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
      '{_PGM_OUT_HEADER_HEX}' || upper({_PGM_ORACLE_PICKS}) AS payload_hex
    FROM m
    """,
)
def ext_media_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end (``fake=False``): build a genuine
    12×8 binary PGM per document JVM-side (md5-chain pixel bytes under
    a canonical netpbm header — attach_pgm_payload), then run the real
    decode → exact nearest-neighbor resample → canonical re-encode
    path (multimodal/binary.reencode_resized, netpbm P5/P6 + BMP
    codecs implemented from their public specs with numpy) through
    the same Arrow mapInPandas plumbing as the stand-in queries.
    Byte-exact: the oracle re-derives the pixel chain and replays the
    constant floor-index map as hex-domain byte picks under the
    resized header — header parse, raster reshape, index math, and
    re-encode all sit on the checked path with genuine pixels."""
    docs = _t(spark, sf_dir, "documents")
    from .multimodal.binary import attach_pgm_payload, resize_media

    media = attach_pgm_payload(docs, width=12, height=8)
    resized = resize_media(media, width=5, height=3, fake=False)
    return resized.select(
        "media_id",
        "media_type",
        "width",
        "height",
        F.hex("payload").alias("payload_hex"),
    )


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------

@query(
    "ext_dedup_exact",
    oracle="""
    SELECT doc_id,
      MIN(doc_id) OVER (PARTITION BY text) AS canonical_doc_id,
      doc_id != MIN(doc_id) OVER (PARTITION BY text) AS is_duplicate
    FROM documents
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup mapping: every doc → canonical (min id)
    representative of its identical-text group."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("text")
    canonical = F.min("doc_id").over(w)
    return docs.select(
        "doc_id",
        canonical.alias("canonical_doc_id"),
        (F.col("doc_id") != canonical).alias("is_duplicate"),
    )


@query(
    "ext_corpus_curation",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, len(toks) AS n,
        LEAST(1.0, len(toks) / 100.0) * 0.4
          + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.3
          + LEAST(1.0, (CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(toks)) * 5.0) * 0.3
          AS q
      FROM t
    )
    SELECT doc_id,
      CASE WHEN n < 25 THEN 'too_short'
           WHEN q < 0.5 THEN 'low_quality' END AS drop_reason,
      n < 25 OR q < 0.5 AS dropped
    FROM s
    """,
)
def ext_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation filter ladder with reasons — the keep/drop decision
    pass of a training-data pipeline, composed from the token-count
    and quality-score primitives. First failing rule names the drop
    reason; the reason column makes filter-rate dashboards and ablation
    audits one groupBy away."""
    docs = _t(spark, sf_dir, "documents")
    n = T.token_count(F.col("text"))
    q = T.quality_score(F.col("text"))
    reason = (
        F.when(n < 25, "too_short")
        .when(q < 0.5, "low_quality")
    )
    return docs.select(
        "doc_id",
        reason.alias("drop_reason"),
        ((n < 25) | (q < 0.5)).alias("dropped"),
    )


@query(
    "ext_train_test_split",
    oracle="""
    SELECT doc_id,
      CASE WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
           THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def ext_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/test assignment by salted MD5 of the
    document id — stable across runs, engines, partitionings, and
    corpus growth (a doc's split never changes when new docs arrive),
    which is the property random sampling lacks. MD5 is in both
    engines, so the oracle reproduces the exact assignment."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("test").alias("split"),
    )


@query(
    "ext_interval_join_errors",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT user_id, event_id AS error_id, epoch_us(ts) AS e_us
      FROM events WHERE event_type = 'error'
    )
    SELECT p.user_id, purchase_id, error_id,
      CAST((e_us - p_us) // 1000000 AS BIGINT) AS lag_sec
    FROM p JOIN e ON p.user_id = e.user_id
      AND e_us >= p_us AND e_us < p_us + 3600000000
    """,
)
def ext_interval_join_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/rangejoin.py): error events landing
    inside the 1-hour window after each purchase by the same user —
    executed as a bucketed hash EQUI-join + refine, never a
    BroadcastNestedLoopJoin. Oracle is the plain inequality join."""
    from .operators.rangejoin import interval_join

    ev = silver_events(_t(spark, sf_dir, "events"))
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "event_ts",
    )
    windows = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("event_ts").alias("window_start"),
            (F.col("event_ts") + F.expr("INTERVAL 1 HOUR")).alias("window_end"),
        )
    )
    errors = base.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("event_ts").alias("error_ts"),
    )
    joined = interval_join(
        errors,
        windows,
        keys=["user_id"],
        point_ts="error_ts",
        start_ts="window_start",
        end_ts="window_end",
        bucket_width_sec=3600,
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "error_id",
        F.floor(
            (F.unix_micros("error_ts") - F.unix_micros("window_start"))
            / 1_000_000
        ).cast("long").alias("lag_sec"),
    )


@query(
    "ext_time_bucket_rollup",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_sec,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket rollup per event type (the hypertable /
    continuous-aggregate pattern): date_trunc bucketing keeps the agg
    a single partial+final pass, and the bucket key is the natural
    partition column for a materialized rollup at scale."""
    ev = silver_events(_t(spark, sf_dir, "events"))
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("event_ts"))
            .cast("long")
            .alias("bucket_sec"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dec_sum(F.col("amount_usd")).alias("total_value"),
        )
    )


@query(
    "ext_asof_attribution",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'view'
    ), p0 AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                           ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), p AS (SELECT user_id, event_id, value, ts_us FROM p0 WHERE rn = 1)
    SELECT v.user_id, v.event_id,
      CAST(v.ts_us // 1000000 AS BIGINT) AS view_sec,
      p.event_id AS matched_event_id,
      p.value AS matched_value,
      CAST((v.ts_us - p.ts_us) // 1000000 AS BIGINT) AS lag_sec
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND p.ts_us <= v.ts_us
    """,
)
def ext_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every view event attributed to
    the user's most recent purchase at-or-before it. Purchases are
    deduped to one per (user, microsecond) in both engines because
    native ASOF tie-breaking is unspecified; timestamps compare at
    microsecond precision (silver's nanos→micros truncation mirrored
    via epoch_us)."""
    from .operators.asof import as_of_join

    ev = silver_events(_t(spark, sf_dir, "events"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_ts").alias("view_ts"),
    )
    purchases = keep_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("amount_usd").alias("value"),
            F.col("event_ts").alias("purchase_ts"),
        ),
        ["user_id", "purchase_ts"],
        ["event_id"],
    )
    joined = as_of_join(
        views,
        purchases,
        keys=["user_id"],
        left_ts="view_ts",
        right_ts="purchase_ts",
        right_tiebreak="event_id",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("view_ts").cast("long").alias("view_sec"),
        F.col("matched_event_id"),
        F.col("matched_value"),
        (
            F.floor(
                (
                    F.unix_micros("view_ts")
                    - F.unix_micros("matched_purchase_ts")
                )
                / 1_000_000
            ).cast("long")
        ).alias("lag_sec"),
    )


@query(
    "ext_text_length_quantiles",
    oracle="""
    WITH t AS (
      SELECT lang, len(string_split(text, ' ')) AS n, length(text) AS chars
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
      quantile_cont(n, 0.25) AS p25_tokens,
      quantile_cont(n, 0.5) AS p50_tokens,
      quantile_cont(n, 0.75) AS p75_tokens,
      quantile_cont(n, 0.99) AS p99_tokens,
      AVG(chars) AS avg_chars
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def ext_text_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length profile: exact interpolated token
    quantiles + mean char length — the distribution pass behind
    length-based corpus filtering. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition, so
    the comparison is bit-exact."""
    docs = _t(spark, sf_dir, "documents")
    stats = docs.select(
        "lang",
        T.token_count(F.col("text")).alias("n"),
        F.length("text").alias("chars"),
    )
    return (
        stats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("percentile(n, 0.25)").alias("p25_tokens"),
            F.expr("percentile(n, 0.5)").alias("p50_tokens"),
            F.expr("percentile(n, 0.75)").alias("p75_tokens"),
            F.expr("percentile(n, 0.99)").alias("p99_tokens"),
            F.avg("chars").alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "ext_dedup_normalized",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
        trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9 \t\n\r]', '', 'g'),
          '[ \t\n\r]+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT doc_id,
      MIN(doc_id) OVER (PARTITION BY norm) AS canonical_doc_id,
      doc_id != MIN(doc_id) OVER (PARTITION BY norm) AS is_duplicate
    FROM canon
    """,
)
def ext_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-exact dedup: canonical-id mapping over
    case/punctuation/whitespace-normalized text — the cheap tier
    between byte-exact and MinHash in a dedup ladder (one window,
    no pairs)."""
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalized_text(F.col("text"))
    w = Window.partitionBy(norm)
    canonical = F.min("doc_id").over(w)
    return docs.select(
        "doc_id",
        canonical.alias("canonical_doc_id"),
        (F.col("doc_id") != canonical).alias("is_duplicate"),
    )


@query(
    "ext_text_vocab",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS term_freq,
      COUNT(DISTINCT doc_id) AS doc_freq
    FROM toks WHERE token != ''
    GROUP BY token
    ORDER BY term_freq DESC, token
    LIMIT 100
    """,
)
def ext_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by term frequency with
    document frequency — the counting pass behind BPE-style vocab
    builds and TF-IDF stats. Explode → one partial+final agg →
    TakeOrderedAndProject; tiebroken for determinism."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), "token")
        .limit(100)
    )


@query(
    "ext_text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token != ''
      GROUP BY 1, 2
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        FLOOR((tf.tf * (ln((CAST(n.n AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) + 1.0)) * 1000000 + 0.5) / 1000000 AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, token) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ext_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (smoothed idf
    ``ln((N+1)/(df+1)) + 1``): explode → two key-partitioned aggs →
    broadcast of the 1-row corpus count (a plan-side cross join, not a
    driver collect) → windowed top-k per doc. ``ln`` differs by 1 ULP
    between Spark (fdlibm) and DuckDB (libm) on some inputs, so scores
    floor-round at 6 dp in BOTH engines before the hash compare and
    before top-k ordering (ties then break on the token)."""
    from .functions.math import roundn

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    idf = F.log((F.col("n").cast("double") + 1.0) / (F.col("df").cast("double") + 1.0)) + 1.0
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            roundn(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "ext_text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    b AS (
      SELECT doc_id,
        list_transform(range(1, len(toks)), i -> concat_ws(' ', toks[i], toks[i+1])) AS bigrams
      FROM t WHERE len(toks) >= 2
    )
    SELECT doc_id,
      CAST(len(bigrams) AS BIGINT) AS n_bigrams,
      CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
      1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams) AS repetition_ratio
    FROM b
    """,
)
def ext_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram repetition ratio (1 − distinct/total bigrams) — the
    duplicate-n-gram quality signal from published LLM-corpus filters
    (Gopher-style repetition rules): high values flag boilerplate and
    degenerate repetition that unigram stats miss. Pure higher-order
    functions, one scan, no explode shuffle."""
    docs = _t(spark, sf_dir, "documents")
    bigrams = T.shingles(F.col("text"), 2)
    n = F.size(bigrams).cast("long")
    nd = F.size(F.array_distinct(bigrams)).cast("long")
    return (
        docs.filter(F.size(T.tokens(F.col("text"))) >= 2)
        .select(
            "doc_id",
            n.alias("n_bigrams"),
            nd.alias("n_distinct_bigrams"),
            (1.0 - nd.cast("double") / n).alias("repetition_ratio"),
        )
    )


@query(
    "ext_decontamination",
    oracle="""
    WITH split AS (
      SELECT doc_id, text,
        CASE WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90
             THEN 'train' ELSE 'test' END AS split
      FROM documents
    ), toks AS (SELECT doc_id, split, string_split(text, ' ') AS t FROM split),
    sh AS (
      SELECT DISTINCT doc_id, split,
        unnest(list_transform(range(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks WHERE len(t) >= 3
    ),
    test_sh AS (SELECT DISTINCT s FROM sh WHERE split = 'test'),
    train_sh AS (SELECT doc_id, s FROM sh WHERE split = 'train'),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM train_sh WHERE s IN (SELECT s FROM test_sh) GROUP BY 1
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train_sh GROUP BY 1)
    SELECT t.doc_id, t.n_shingles,
      COALESCE(h.n_contaminated, 0) AS n_contaminated,
      CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles AS contamination_ratio,
      CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles >= 0.5 AS is_contaminated
    FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id
    """,
)
def ext_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per TRAIN doc, the fraction of its
    distinct 3-grams that also occur anywhere in the TEST split (the
    n-gram-overlap contamination check used before training on a
    corpus that must not leak eval data). The test-side shingle set is
    bounded by the benchmark size, so the membership probe is a
    broadcast LEFT SEMI join against the fact-side shingles — no
    all-pairs comparison, one shuffle for the per-doc counts."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    tagged = docs.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("test").alias("split"),
        T.shingles(F.col("text"), 3).alias("sh"),
    ).filter(F.size("sh") > 0)
    exploded = tagged.select(
        "doc_id", "split", F.explode(F.array_distinct("sh")).alias("s")
    )
    train_sh = exploded.filter(F.col("split") == "train").select("doc_id", "s")
    test_sh = exploded.filter(F.col("split") == "test").select("s").distinct()
    hits = (
        train_sh.join(F.broadcast(test_sh), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ratio = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double") / F.col(
        "n_shingles"
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            ratio.alias("contamination_ratio"),
            (ratio >= 0.5).alias("is_contaminated"),
        )
    )


@query(
    "ext_skew_salted_join",
    oracle="""
    SELECT p.p_brand,
      COUNT(*) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def ext_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): fact side scattered by a
    deterministic hash salt, dim side exploded ×8, join on (key, salt)
    — the explicit hot-key mitigation for when the dim can't broadcast
    and AQE's skew splitting isn't enough. The oracle is the PLAIN
    join: salting must be result-invisible."""
    from .operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(
        li, part, on=["l_partkey"], fact_unique_col="l_orderkey", how="inner",
        salt_buckets=8,
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum(F.col("l_extendedprice")).alias("revenue"),
    )


@query(
    "ext_text_unk_replace",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      FROM documents
    ), freq AS (
      SELECT token, COUNT(*) AS tf FROM toks WHERE token != '' GROUP BY 1
    ), top AS (
      SELECT list(token) AS lst FROM (
        SELECT token FROM freq ORDER BY tf DESC, token LIMIT 10
      )
    )
    SELECT doc_id,
      array_to_string(
        list_transform(string_split_regex(text, '\\s+'),
          t -> CASE WHEN list_contains(top.lst, t) THEN t ELSE '<unk>' END),
        ' ') AS unk_text,
      CAST(len(list_filter(string_split_regex(text, '\\s+'),
        t -> NOT list_contains(top.lst, t))) AS BIGINT) AS n_replaced
    FROM documents CROSS JOIN top
    """,
)
def ext_text_unk_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary truncation: rebuild every document with
    out-of-vocabulary tokens (outside the corpus top-10 by term
    frequency) replaced by ``<unk>`` — the closed-vocab preprocessing
    pass of classic LM training. Two aggregation passes (term counts →
    top-k) and a broadcast of the bounded vocabulary into a
    higher-order rewrite; the document rewrite itself is one map
    stage, no explode."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("token")).filter(
        F.col("token") != ""
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(10)
        .agg(F.collect_list("token").alias("lst"))
    )
    with_vocab = docs.crossJoin(F.broadcast(top))
    tcol = T.tokens(F.col("text"))
    rewritten = F.transform(
        tcol,
        lambda t: F.when(F.array_contains(F.col("lst"), t), t).otherwise(
            F.lit("<unk>")
        ),
    )
    n_replaced = F.size(
        F.filter(tcol, lambda t: ~F.array_contains(F.col("lst"), t))
    ).cast("long")
    return with_vocab.select(
        "doc_id",
        F.concat_ws(" ", rewritten).alias("unk_text"),
        n_replaced.alias("n_replaced"),
    )


@query(
    "ext_shard_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY lang
          ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
      CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_id
    FROM c
    """,
)
def ext_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: assign documents to ~2000-token shards
    per language, deterministically (docs ordered by salted MD5 —
    a stable pseudo-shuffle — then packed by cumulative token count).
    Partitioned by lang so the running sum shuffles once on the
    partition key; at scale the same pattern runs per date/bucket
    partition, keeping every window bounded. Pure integer arithmetic,
    bit-exact across engines."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        T.token_count(F.col("text")).alias("n_tokens"),
    )
    order_key = F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("lang")
        .orderBy(order_key, "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 2000).cast("long").alias("shard_id"),
    )


_STRATA_RATES = {"en": 5000, "es": 2500, "fr": 2500, "de": 1000}  # per-10k
_STRATA_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {per10k}" for lang, per10k in _STRATA_RATES.items()
)

@query(
    "ext_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE CAST(('0x' || substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < CASE {_STRATA_SQL} ELSE 0 END
    """,
)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    (en 50%, es/fr 25%, de 10%) applied via salted-MD5 bucketing — the
    rebalancing pass of corpus curation. Unlike ``sampleBy``, the
    decision is a pure function of the doc id: stable across runs,
    engines, partitionings, and corpus growth, and the oracle
    reproduces the exact sample."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    rate = F.lit(0)
    for lang, per10k in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, per10k).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang")


@query(
    "ext_sketch_profile",
    oracle="""
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      MIN(n_chars) AS chars_min,
      MAX(n_chars) AS chars_max,
      quantile_cont(n_chars, 0.5) AS chars_p50,
      quantile_cont(n_chars, 0.95) AS chars_p95,
      TRUE AS hll_texts_ok,
      TRUE AS hll_sources_ok,
      TRUE AS kll_p50_ok,
      TRUE AS kll_p95_ok
    FROM documents GROUP BY lang
    """,
)
def ext_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus profile per language: HyperLogLog++ distinct
    counts (``approx_count_distinct``) and KLL-style quantiles
    (``approx_percentile``) — the mergeable-sketch scale path for
    profiling 100 TB where exact distinct/percentile would shuffle
    every value.

    Sketch outputs are implementation-defined, so the checkable
    contract is: exact aggregates (count/min/max and ``percentile``,
    proven bit-equal to DuckDB ``quantile_cont``) plus ``*_ok``
    booleans asserting each sketch landed within its configured error
    of the exact answer, computed side-by-side in the same
    aggregation. The oracle expects every ``*_ok`` to be TRUE. (The
    exact columns double as the verification harness; a pure-scale
    profiling run would keep only the sketch columns.) Tighter rank
    bounds are asserted in tests/test_sketches.py."""
    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("chars_min"),
        F.max("n_chars").alias("chars_max"),
        F.expr("percentile(n_chars, 0.5)").alias("chars_p50"),
        F.expr("percentile(n_chars, 0.95)").alias("chars_p95"),
        F.countDistinct("text").alias("_exact_texts"),
        F.countDistinct("source").alias("_exact_sources"),
        F.approx_count_distinct("text", 0.02).alias("_hll_texts"),
        F.approx_count_distinct("source", 0.02).alias("_hll_sources"),
        F.expr("approx_percentile(n_chars, 0.5, 5000)").alias("_kll_p50"),
        F.expr("approx_percentile(n_chars, 0.95, 5000)").alias("_kll_p95"),
        # Rank-slack windows for the approx percentiles (generous vs
        # the n/5000 guarantee so coarse tiny groups can't flake).
        F.expr("percentile(n_chars, 0.48)").alias("_p50_lo"),
        F.expr("percentile(n_chars, 0.52)").alias("_p50_hi"),
        F.expr("percentile(n_chars, 0.93)").alias("_p95_lo"),
        F.expr("percentile(n_chars, 0.97)").alias("_p95_hi"),
    )

    def _rel_ok(approx: F.Column, exact: F.Column) -> F.Column:
        # rsd=0.02 → 10% is a ~5-sigma bound; ±2 absolute for tiny groups
        return F.abs(approx - exact) <= F.greatest(F.lit(2.0), exact * 0.10)

    return agg.select(
        "lang",
        "n_docs",
        "chars_min",
        "chars_max",
        "chars_p50",
        "chars_p95",
        _rel_ok(F.col("_hll_texts"), F.col("_exact_texts")).alias("hll_texts_ok"),
        _rel_ok(F.col("_hll_sources"), F.col("_exact_sources")).alias(
            "hll_sources_ok"
        ),
        F.col("_kll_p50").between(F.col("_p50_lo"), F.col("_p50_hi")).alias(
            "kll_p50_ok"
        ),
        F.col("_kll_p95").between(F.col("_p95_lo"), F.col("_p95_hi")).alias(
            "kll_p95_ok"
        ),
    )


@query(
    "ext_dedup_ngram_jaccard",
    # The shingle CTE is the CAPPED twin (operators/neardup.py
    # ORACLE_SH_CAPPED): stop-shingles above max(32, min(0.5% of corpus, 4096))
    # document frequency are removed from the sets in BOTH engines —
    # identity at fixture scale (floor 32 vs max observed df 25),
    # quadratic-blowup guard at probe scale and beyond.
    oracle=f"""
    WITH {neardup.ORACLE_SH_CAPPED},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
      sa.n AS n_a, sb.n AS n_b,
      CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.5
    """,
)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard near-dup pairs (≥ 0.5) via
    shared-shingle join — the ground truth the LSH variants
    approximate. Jaccard is over INFORMATIVE shingles: the default
    stop-shingle cap (df ≤ max(32, min(0.5% of corpus, 4096)), mirrored
    in the oracle) keeps the self-join linear-ish on boilerplate-dense
    corpora where uncapped candidates grow quadratically."""
    docs = _t(spark, sf_dir, "documents")
    return neardup.ngram_jaccard_pairs(docs, threshold=0.5)


@query(
    "ext_dedup_minhash_lsh",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
      FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
      CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
    FROM shared
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.5
    """,
)
def ext_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) + 32-band LSH candidates, exact-Jaccard
    verified ≥ 0.5. The verify stage removes all false positives, so
    the output equals the exact all-pairs result minus LSH misses;
    with 2-row bands the miss probability at j = 0.5 is
    (1 - 0.25)^32 ≈ 1e-4 per pair and the fixture's documents table
    is fixed at 500 rows with deterministic hashes, so the exact
    oracle holds (recall is additionally property-tested in
    tests/test_neardup.py)."""
    docs = _t(spark, sf_dir, "documents")
    return neardup.minhash_lsh_pairs(
        docs, num_perm=64, bands=32, threshold=0.5
    )


@query(
    "ext_dedup_clusters",
    # Capped shingle CTE — see ext_dedup_ngram_jaccard's note.
    oracle=f"""
    WITH RECURSIVE {neardup.ORACLE_SH_CAPPED},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM shared
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.2
    ),
    und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, reach) AS (
      SELECT a, a FROM und
      UNION
      SELECT w.node, u.b FROM walk w JOIN und u ON w.reach = u.a
    ),
    comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
    SELECT d.doc_id,
      COALESCE(c.component, d.doc_id) AS cluster_id,
      COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """,
)
def ext_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *clustering*: exact 3-gram-Jaccard pairs (≥ 0.2,
    default stop-shingle cap — the uncapped pair join measured 1389s
    at the sf1 probe vs ~5s at sf0.1, 99.8% of its 6.0e9 candidate
    rows from boilerplate shingles) → connected components
    (operators/cluster.py, min-label propagation with pointer
    jumping) → every doc mapped to its cluster's minimum id,
    singletons to themselves, one canonical keeper per cluster.
    Transitive closure is the step pair-listing misses: A≈B≈C collapses
    to one group even when A and C are not directly similar. Oracle is
    a DuckDB recursive-CTE transitive closure over the same capped
    pairs."""
    from .operators.cluster import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    # materialize=True: the pair relation is consumed TWICE by the
    # component step (the symmetrizing union references it in both
    # branches) — an eager checkpoint runs the capped-shingle joins
    # once instead of twice, and releases the shingle-group cache
    # before the join-heavy CC stage (r10: 6.8s → 4.4s at sf0.1
    # together with the bounded union-find fast path)
    pairs = neardup.ngram_jaccard_pairs(
        docs, threshold=0.2, materialize=True
    ).select("doc_a", "doc_b")
    return dedup_clusters(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).select("doc_id", "cluster_id", "is_canonical")


@query(
    "ext_dedup_simhash",
    # Mirrors the portable (md5-token-hash, 60-bit) SimHash pipeline
    # exactly: per-token 60-bit hash → ±1 bit votes → sign fingerprint
    # → 4×15-bit band join → bit_count(xor) Hamming verify.
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
        CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM toks
    ),
    bitvals AS (
      SELECT doc_id, j,
        CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
             THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END AS bitval
      FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS j) bit_positions
      GROUP BY doc_id, j
    ),
    fp AS (
      SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash
      FROM bitvals GROUP BY doc_id
    ),
    buckets AS (
      SELECT doc_id, simhash, b, (simhash >> (b * 15)) & 32767 AS bucket
      FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) band_ids
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
             l.simhash AS sh_a, r.simhash AS sh_b
      FROM buckets l JOIN buckets r
        ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 8
    """,
)
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-banded near-dup pairs with exact Hamming verify, in the
    portable 60-bit md5-hash mode so the full pipeline (votes, sign
    fingerprint, banding, Hamming) is bit-reproducible in DuckDB. The
    xxhash64 fast path stays the operator default and is covered by
    tests/test_neardup.py."""
    docs = _t(spark, sf_dir, "documents")
    return neardup.simhash_pairs(
        docs, max_hamming=8, bands=4, bits=60, portable=True
    )


# Canonical cross-engine fragments (operators/neardup.py): the cosine
# left fold and the adaptive-C IVF cent/assigned CTEs live in ONE
# place so the C formula, centroid order, and fold shape can never
# drift between the registries that mirror them.
_cos_sql = neardup.oracle_cosine_sql
_ORACLE_IVF_ADAPTIVE = neardup.oracle_ivf_adaptive()


@query(
    "ext_dedup_embedding",
    oracle=f"""
    WITH {_ORACLE_IVF_ADAPTIVE},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        {_cos_sql('a.embedding', 'b.embedding')} AS cosine_sim
      FROM assigned a JOIN assigned b
        ON a.bucket_id = b.bucket_id AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.4
    """,
)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (≥ 0.4) on the 100 TB path:
    adaptive-C IVF bucketing (C = max(8, ⌈√n⌉)) + within-bucket
    cosine scoring — the only broadcast is the C-row centroid table
    and the pair join is an equi-join on bucket_id, never all-pairs.
    The salted-md5 centroid pick, argmax assignment, and double
    left-fold cosine are bit-identical across engines, so the oracle
    replays the whole bucketed pipeline including the √n cap. The
    brute-force all-pairs generator stays as the C=1 cross-check in
    tests/test_neardup.py only."""
    emb = _t(spark, sf_dir, "embeddings")
    return neardup.embedding_neardup_pairs_bucketed(emb, threshold=0.4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@query(
    "ext_similarity_topk",
    # cosine: the canonical cross-engine fold (operators/neardup.py)
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        {_cos_sql("q.embedding", "c.embedding")} AS cosine_sim
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ext_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for query vectors vec_id < 10
    (broadcast queries → fold-scored map stage → windowed top-k)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk(emb, queries_df, k=5)


_IVF_KM_CTES, _IVF_KM_FINAL, _ = kmeans.oracle_centroid_chain(
    16, 2, 64, "ivfkm:", suffix="_km"
)


@query(
    "ext_similarity_ivf",
    # Approximate by design (recall<1 vs brute force) yet fully
    # deterministic: the coarse quantizer is now TRAINED — the
    # fixed-point Lloyd chain (operators/kmeans.py fragments, reseeds
    # included) replays bit-for-bit, its centroids dequantize exactly
    # (÷2^20 is a power of two), and the argmax bucket assignment,
    # nprobe probe ranking, and final top-k mirror as before.
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    {",".join(_IVF_KM_CTES)},
    cent AS (
      SELECT cluster AS centroid_id,
        list_transform(qc, v -> CAST(v AS DOUBLE) / {kmeans.SCALE}) AS cvec
      FROM {_IVF_KM_FINAL}
    ),
    asn AS (
      SELECT vec_id, embedding, centroid_id AS bucket_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC, c.centroid_id
               ) AS rn
        FROM e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qvec, bucket_id FROM (
        SELECT q.vec_id AS query_id, q.embedding AS qvec,
               c.centroid_id AS bucket_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.embedding', 'c.cvec')} DESC, c.centroid_id
               ) AS rn
        FROM e q CROSS JOIN cent c WHERE q.vec_id < 10
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_cos_sql('p.qvec', 'a.embedding')} AS cosine_sim
      FROM asn a JOIN probes p ON a.bucket_id = p.bucket_id
      WHERE a.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
)
def ext_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5 for the same query set, with a
    TRAINED coarse quantizer: 16 centroids from two fixed-point Lloyd
    iterations (operators/kmeans.kmeans_centroids) replace the
    salted-hash pseudo-sample — trained centroids track the corpus
    distribution, so buckets are better balanced and recall@nprobe is
    at least the hash pick's (asserted vs exact in
    tests/test_similarity.py). The whole pipeline — fit chain,
    dequantization, bucket argmax, probe ranking, top-5 — is replayed
    by the DuckDB oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    cents = kmeans.kmeans_centroids(emb, k=16, n_iters=2, salt="ivfkm:")
    return similarity.cosine_topk_ivf(
        emb, queries_df, k=5, nprobe=4, centroids=cents
    )


def _rh_hyperplanes_sql(n_bits: int = 32, dim: int = 64) -> str:
    """VALUES rows for the RH-LSH hyperplanes, regenerated with the
    same seed as operators/similarity.py:cosine_topk_rhlsh. ``repr``
    of a Python float is shortest-round-trip, and DuckDB's literal
    parser is correctly rounded, so each literal lands on the exact
    same double the Spark plan broadcasts."""
    rnd = random.Random(0xC05EED)
    rows = []
    for i in range(n_bits):
        vec = ", ".join(repr(rnd.uniform(-1.0, 1.0)) for _ in range(dim))
        rows.append(f"({i}, [{vec}])")
    return ",\n      ".join(rows)


@query(
    "ext_similarity_lsh",
    # Approximate (recall<1) yet deterministic: seeded hyperplanes are
    # inlined as exact double literals, so sign bits, band buckets,
    # the candidate join, and the top-k all mirror bit-for-bit.
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    hp(bit_idx, hvec) AS (VALUES
      {_rh_hyperplanes_sql(n_bits=32, dim=64)}
    ),
    bits AS (
      SELECT e.vec_id, hp.bit_idx,
        CASE WHEN list_reduce(list_transform(range(1, len(e.embedding)+1),
               i -> CAST(e.embedding[i] AS DOUBLE) * hp.hvec[i]), (x,y) -> x+y) >= 0
             THEN 1 ELSE 0 END AS bit
      FROM e CROSS JOIN hp
    ),
    buckets AS (
      SELECT vec_id, bit_idx // 4 AS band,
             CAST(SUM(bit * (1 << (bit_idx % 4))) AS BIGINT) AS bucket
      FROM bits GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM (SELECT * FROM buckets WHERE vec_id < 10) qb
      JOIN buckets cb ON qb.band = cb.band AND qb.bucket = cb.bucket
      WHERE cb.vec_id != qb.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             {_cos_sql('q.embedding', 'n.embedding')} AS cosine_sim
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN e n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id
      ) AS rn FROM scored
    ) WHERE rn <= 5
    """,
)
def ext_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-5 for the same query set
    — the stateless, append-friendly ANN scale path (no centroid
    model); recall vs exact is asserted in tests/test_similarity.py
    and the seeded pipeline is replayed whole by the DuckDB oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_rhlsh(emb, queries_df, k=5, n_bits=32, bands=8)


# ---------------------------------------------------------------------------
# Parameterized SQL (OP-sql-between: named params, Spark ≥3.4)
# ---------------------------------------------------------------------------

@query(
    "op_sql_named_params",
    oracle="""
    SELECT
      CAST(o_orderdate AS DATE) AS order_date,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
      COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE)
          BETWEEN TRY_CAST('1996-06-01' AS DATE) AND TRY_CAST('1996-06-30' AS DATE)
    GROUP BY 1
    """,
)
def op_sql_named_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string entry point with named parameters — the reference's
    dashboard execution model (``:start_date``/``:end_date`` +
    TRY_CAST, analysis/dashboard_queries/01_product_performance.sql:26),
    run via ``spark.sql(q, args=...)``."""
    from .sources.catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT
          CAST(o_orderdate AS DATE) AS order_date,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
          COUNT(*) AS order_count
        FROM orders_v
        WHERE CAST(o_orderdate AS DATE)
              BETWEEN TRY_CAST(:start_date AS DATE) AND TRY_CAST(:end_date AS DATE)
        GROUP BY 1
        """,
        args={"start_date": "1996-06-01", "end_date": "1996-06-30"},
    )


# ---------------------------------------------------------------------------
# Extended window functions (beyond the reference's row_number)
# ---------------------------------------------------------------------------

@query(
    "ext_window_funcs",
    oracle="""
    SELECT
      CAST(o_orderkey AS VARCHAR) AS order_id,
      CAST(o_custkey AS VARCHAR) AS customer_id,
      ROW_NUMBER() OVER w AS order_seq,
      RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS date_rank,
      NTILE(4) OVER w AS quartile,
      LAG(o_totalprice) OVER w AS prev_total,
      LEAD(o_totalprice) OVER w AS next_total,
      date_diff('day', LAG(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def ext_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/ntile per-customer order analytics — the
    SURVEY.md §2.5 extension surface (the reference declared but never
    used a session window spec, 03_gold_aggregate.py:33-34)."""
    orders = silver_orders(_t(spark, sf_dir, "orders"))
    # order_id is a normalized STRING id — sort on its numeric value so
    # the total order matches the oracle's BIGINT key ordering.
    order_key = F.col("order_id").cast("long")
    w = Window.partitionBy("customer_id").orderBy("order_date", order_key)
    w_rank = Window.partitionBy("customer_id").orderBy("order_date")
    return orders.select(
        "order_id",
        "customer_id",
        F.row_number().over(w).alias("order_seq"),
        F.rank().over(w_rank).alias("date_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("total_usd").over(w).alias("prev_total"),
        F.lead("total_usd").over(w).alias("next_total"),
        F.datediff(
            F.col("order_date"), F.lag("order_date").over(w)
        ).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Streaming-equivalent sessionization (session_window in batch mode)
# ---------------------------------------------------------------------------

# the session_window merge rule, reproduced in ANSI SQL: events merge
# while the inter-event gap is STRICTLY below 30 min (windows must
# overlap), at microsecond precision. Shared by the declarative
# (session_window) and custom-stateful (applyInPandasWithState)
# implementations — both must produce exactly these rows.
_SESSION_ORACLE = """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type, value,
        CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), seq AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM ordered
    )
    SELECT CAST(user_id AS VARCHAR) AS user_id,
      CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start_sec,
      CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS session_end_sec,
      COUNT(*) AS event_count,
      CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS session_revenue
    FROM seq GROUP BY user_id, session_seq
    """


@query(
    "ext_incremental_rollup",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_sec,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ext_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (operators/rollup.py): the
    hourly rollup computed as ``merge(partial(first half),
    partial(second half))`` — the refresh path that touches only new
    partitions at scale. Additive DECIMAL state makes the merged
    result bit-identical to the one-shot rollup, which is exactly what
    the oracle computes directly."""
    from .operators.rollup import merge_rollups, partial_rollup

    ev = silver_events(_t(spark, sf_dir, "events")).withColumn(
        "bucket_sec", F.date_trunc("hour", F.col("event_ts")).cast("long")
    )
    halves = [
        ev.filter(F.col("event_date") < "2024-01-15"),
        ev.filter(F.col("event_date") >= "2024-01-15"),
    ]
    states = [
        partial_rollup(
            h,
            ["bucket_sec", "event_type"],
            {"total_value_dec": F.col("amount_usd")},
            count_col="n_events",
        )
        for h in halves
    ]
    merged = merge_rollups(states, ["bucket_sec", "event_type"], count_col="n_events")
    return merged.select(
        "bucket_sec",
        "event_type",
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
    )


@query(
    "stream_interval_join",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ), e AS (
      SELECT user_id, event_id AS error_id, epoch_us(ts) AS e_us
      FROM events WHERE event_type = 'error'
    )
    SELECT p.user_id, purchase_id, error_id,
      CAST((e_us - p_us) // 1000000 AS BIGINT) AS lag_sec
    FROM p JOIN e ON p.user_id = e.user_id
      AND e_us >= p_us AND e_us < p_us + 3600000000
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (streaming/joins.py): errors within
    one hour of a purchase by the same user, computed by a real
    Structured Streaming job — two watermarked streams, range-bounded
    join state, append output. Same semantics (and same oracle) as the
    batch ext_interval_join_errors; the streaming planner keeps the
    range predicate for state eviction where the batch operator
    bucket-hashes it."""
    from .streaming.joins import run_stream_stream_join_bounded

    ev = silver_events(_t(spark, sf_dir, "events"))
    base = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "event_ts",
    )
    errors = base.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("event_ts").alias("error_ts"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_ts").alias("purchase_ts"),
    )
    joined = run_stream_stream_join_bounded(
        spark,
        errors,
        purchases,
        key="user_id",
        left_ts="error_ts",
        right_ts="purchase_ts",
        window="1 hour",
        watermark="1 hour",
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "error_id",
        F.floor(
            (F.unix_micros("error_ts") - F.unix_micros("purchase_ts"))
            / 1_000_000
        ).cast("long").alias("lag_sec"),
    )


@query(
    "stream_time_window_rollup",
    oracle="""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_sec,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_time_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup via ``F.window`` (streaming/sessions.py
    windowed_rollup) — the §2.9 fixed-window operator. The same
    expressions run under readStream + watermark in
    tests/test_streaming.py; hour windows align to epoch hours, so the
    oracle is a date_trunc groupBy."""
    from .streaming.sessions import windowed_rollup

    ev = silver_events(_t(spark, sf_dir, "events"))
    roll = windowed_rollup(ev, "event_ts", "1 hour")
    return roll.select(
        F.col("win.start").cast("long").alias("bucket_sec"),
        "event_type",
        "n_events",
        "total_value",
    )


@query("stream_session_stateful", oracle=_SESSION_ORACLE)
def stream_session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``
    (event-time timeout) — the extension point for per-group state
    machines the built-in ``session_window`` cannot express. Runs a
    real Structured Streaming job over the fixture events (bounded
    harness with a watermark sentinel) and must reproduce the
    session_window merge rule exactly; revenue accumulates in integer
    micro-units for bit-parity with the DECIMAL(30,6) batch sum."""
    ev = silver_events(_t(spark, sf_dir, "events"))
    return run_stateful_sessions_bounded(
        spark, ev, gap="30 minutes", watermark="1 hour"
    )


@query("stream_session_window", oracle=_SESSION_ORACLE)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``session_window`` gap sessionization — the batch twin of the
    streaming pipeline in streaming/sessions.py (identical column
    expressions run under readStream + watermark; see
    tests/test_streaming.py). Oracle replicates Spark's merge rule:
    events merge while the inter-event gap is STRICTLY below the
    30-min gap (windows must overlap), at microsecond precision."""
    ev = silver_events(_t(spark, sf_dir, "events"))
    roll = session_rollup(ev, "user_id", "event_ts", "30 minutes")
    return roll.select(
        "user_id",
        F.col("session_start_ts").cast("long").alias("session_start_sec"),
        F.col("session_end_ts").cast("long").alias("session_end_sec"),
        "event_count",
        "session_revenue",
    )


# Deferred oracle-nesting tokens (see registry.resolve_deferred_oracles):
# this module may be the first-imported, hence the last to finish — run
# the idempotent resolver so every token is spliced regardless of order.
from .registry import resolve_deferred_oracles as _rdo  # noqa: E402
_rdo()
del _rdo
