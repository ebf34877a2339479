"""Round-2 curation-operator registry: quality-aware dedup retention,
duplicate-span coverage, percentile quality banding, identifier
pseudonymization, temperature-balanced language resampling, exact
prefix-filter similarity join, and kNN label prediction.

These extend the training-data-pipeline surface (BASELINE.json north
star) beyond round 1's dedup/similarity/text set. Same cross-engine
determinism rules as registry.py: integer or correctly-rounded IEEE
arithmetic only (sqrt/division are correctly rounded in both engines;
ln/pow are NOT and are avoided), md5 for portable bucketing, explicit
tiebreaks under every window/LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .operators import neardup, similarity
from .operators.neardup import _spread
from .registry import _t, query

# ---------------------------------------------------------------------------
# Duplicate-span coverage (Gopher-style memorization-risk signal)
# ---------------------------------------------------------------------------

_SHINGLE8 = (
    "list_transform(range(1, len(t)-6), i -> concat_ws(' ', "
    "t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7]))"
)

@query(
    "ext_dup_span_coverage",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLE8}) AS s
      FROM toks WHERE len(t) >= 8
    ),
    freq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1)
    SELECT doc_id,
      COUNT(*) AS n_spans,
      CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
      CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
    FROM sh JOIN freq USING (s)
    GROUP BY 1
    """,
)
def ext_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a doc's
    distinct 8-gram spans that also occur in at least one other doc —
    the span-level memorization-risk metric behind substring-level
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"). Two shuffles (span df, per-doc rollup), both on
    high-cardinality keys; no all-pairs join anywhere, so it scales
    linearly with corpus size."""
    docs = _t(spark, sf_dir, "documents")
    ds = neardup._doc_shingles(docs, "doc_id", "text", 8)
    freq = ds.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long")
    return (
        ds.join(freq, ["shingle"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            dup.alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans")).alias(
                "dup_ratio"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Substring-dedup application (remove duplicated spans, rebuild text)
# ---------------------------------------------------------------------------

@query(
    "ext_dedup_span_cut",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    post AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p, t[i+1] AS tok
      FROM toks, unnest(range(0, CAST(len(t) AS BIGINT))) AS u(i)
    ),
    pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p,
        concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4],
                       t[i+5], t[i+6], t[i+7], t[i+8]) AS s
      FROM toks, unnest(range(0, CAST(len(t) - 7 AS BIGINT))) AS u(i)
      WHERE len(t) >= 8
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM pos),
    freq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY 1),
    dup AS (SELECT doc_id, p FROM pos JOIN freq USING (s) WHERE df >= 2),
    cov AS (
      SELECT DISTINCT doc_id, p + CAST(j AS BIGINT) AS q
      FROM dup, unnest(range(0, 8)) AS v(j)
    ),
    kept AS (
      SELECT pt.doc_id, pt.p, pt.tok
      FROM post pt ANTI JOIN cov c ON pt.doc_id = c.doc_id AND pt.p = c.q
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY p) AS cleaned
      FROM kept GROUP BY 1
    )
    SELECT d.doc_id,
      CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(string_split(d.text, ' ')) - COALESCE(a.n_kept, 0) AS BIGINT)
        AS n_removed,
      COALESCE(a.cleaned, '') AS cleaned_text
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def ext_dedup_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the substring-dedup cut — the step after
    ext_dup_span_islands in the Lee et al. pipeline: every token
    position covered by any cross-document duplicated 8-gram span
    ([p, p+7] for each duplicated occurrence p) is removed, and the
    surviving tokens are reassembled in order into the cleaned text.
    Emits per doc the original token count, removed-token count, and
    the rewritten text (empty string when a doc is entirely
    duplicated material).

    Scale shape (all linear, window-free): positional shingling and
    token positions are map-side explodes; span df is one shuffle on
    the 8-gram key; coverage is a bounded 8× fan-out of duplicated
    positions; removal is an anti-join on (doc, position); reassembly
    is one groupBy(doc) with an in-group array_sort — the same
    no-global-sort reassembly as ext_dedup_lines. The covered-position
    explode is equivalent to materializing the merged islands' token
    union, so no interval-merge window is needed."""
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select("doc_id", "text", F.split("text", " ").alias("t"))
    post = toks.select(
        "doc_id", F.posexplode("t").alias("p", "tok")
    ).withColumn("p", F.col("p").cast("long"))
    spans = toks.filter(F.size("t") >= 8).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 8),
                lambda i: F.array_join(F.slice("t", i + 1, 8), " "),
            )
        ).alias("p", "s"),
    ).withColumn("p", F.col("p").cast("long"))
    freq = spans.select("doc_id", "s").distinct().groupBy("s").agg(
        F.count(F.lit(1)).alias("df")
    )
    dup = spans.join(
        freq.filter(F.col("df") >= 2).select("s"), ["s"], "leftsemi"
    )
    cov = dup.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + 7)).alias("q"),
    ).distinct()
    kept = post.join(
        cov,
        (post["doc_id"] == cov["doc_id"]) & (post["p"] == cov["q"]),
        "left_anti",
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("cleaned"),
    )
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select("doc_id", "text")
        .join(agg, ["doc_id"], "left")
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            (n_tokens - F.coalesce(F.col("n_kept"), F.lit(0))).cast(
                "long"
            ).alias("n_removed"),
            F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-ish subword unit counting (token-budget estimation)
# ---------------------------------------------------------------------------

# disjoint character-class alternatives ⇒ identical matching in Java
# regex (Spark) and RE2 (DuckDB): letter runs capped at 4 chars (a
# BPE-like subword unit), digit runs, any other non-space symbol
_SUBWORD_RE = r"[a-z]{1,4}|[0-9]+|[^a-z0-9\s]"

@query(
    "ext_text_subword_stats",
    oracle=rf"""
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '{_SUBWORD_RE}')) AS BIGINT) AS n_subword_units,
      CAST(len(regexp_extract_all(text, '{_SUBWORD_RE}')) AS DOUBLE)
        / len(string_split(text, ' ')) AS units_per_word,
      CAST(n_chars AS DOUBLE)
        / len(regexp_extract_all(text, '{_SUBWORD_RE}')) AS chars_per_unit
    FROM documents
    """,
)
def ext_text_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation with a BPE-ish subword proxy: letter
    runs capped at 4 chars + digit runs + symbols. ``units_per_word``
    and ``chars_per_unit`` are the fertility / compression stats used
    to size training shards and context windows before running a real
    tokenizer. Map-side only (regexp_count per row, no shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    units = F.regexp_count(F.col("text"), F.lit(_SUBWORD_RE)).cast("long")
    words = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        units.alias("n_subword_units"),
        (units.cast("double") / words).alias("units_per_word"),
        (F.col("n_chars").cast("double") / units).alias("chars_per_unit"),
    )


# ---------------------------------------------------------------------------
# Quality-aware cluster retention (dedup keeps the BEST doc, not the min-id)
# ---------------------------------------------------------------------------

# Shingle CTE is the capped twin (operators/neardup.py
# ORACLE_SH_CAPPED) — mirrors the generators' default stop-shingle
# cap so the pair relation matches ngram_jaccard_pairs at any scale.
_CC_PAIRS_02 = f"""
    {neardup.ORACLE_SH_CAPPED},
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
"""

@query(
    "ext_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_CC_PAIRS_02},
    assigned AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(c.component, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, cluster_id,
      ROW_NUMBER() OVER (PARTITION BY cluster_id
                         ORDER BY n_chars DESC, doc_id) = 1 AS is_kept
    FROM assigned
    """,
)
def ext_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup retention: near-dup clusters (3-gram
    Jaccard ≥ 0.2 → connected components) keep their LONGEST member
    (n_chars desc, doc_id tiebreak) instead of the arbitrary min-id —
    the retention policy real curation pipelines use (keep the most
    complete variant, drop truncations). One extra window over the
    cluster key on top of ext_dedup_clusters."""
    from .operators.cluster import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    # materialize=True — the same r10 fix ext_dedup_clusters carries:
    # the component step consumes the pair relation TWICE (both
    # branches of the symmetrizing union), so an eager checkpoint
    # runs the capped-shingle joins once instead of twice and
    # releases the shingle-group cache before the join-heavy CC
    # stage (sf1 probe: keep_best ran 5.9x at 10x data with the
    # chain re-evaluated; clusters holds ~4x with it materialized)
    pairs = neardup.ngram_jaccard_pairs(
        docs, threshold=0.2, materialize=True
    ).select("doc_a", "doc_b")
    clustered = dedup_clusters(
        docs.select("doc_id", "n_chars"), pairs, id_col="doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return clustered.select(
        "doc_id", "cluster_id", (F.row_number().over(w) == 1).alias("is_kept")
    )


# ---------------------------------------------------------------------------
# Semantic dedup clusters (embedding-space transitive closure)
# ---------------------------------------------------------------------------

@query(
    "ext_dedup_semantic_clusters",
    # cent/assigned: the CANONICAL adaptive-C IVF twin
    # (operators/neardup.oracle_ivf_adaptive — same fragment
    # registry_ext splices, so the C formula and centroid order can
    # never drift between the two embedding queries).
    oracle=f"""
    WITH RECURSIVE {neardup.oracle_ivf_adaptive()},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.bucket_id = b.bucket_id AND a.vec_id < b.vec_id
      WHERE {neardup.oracle_cosine_sql("a.embedding", "b.embedding")} >= 0.4
    ),
    und AS (SELECT id_a AS x, id_b AS y FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    walk(node, reach) AS (
      SELECT x, x FROM und
      UNION
      SELECT w.node, u.y FROM walk w JOIN und u ON w.reach = u.x
    ),
    comp AS (SELECT node, MIN(reach) AS component FROM walk GROUP BY node)
    SELECT v.vec_id,
      COALESCE(c.component, v.vec_id) AS cluster_id,
      COALESCE(c.component, v.vec_id) = v.vec_id AS is_canonical
    FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.node
    """,
)
def ext_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al., 2023 — public
    paper): IVF-bucket the embedding space, take cosine pairs ≥ 0.4
    *within buckets only* → connected components → one canonical
    vector per semantic cluster. Within-cluster-only pairing is the
    published SemDeDup contract and the 100 TB shape: the only
    broadcast is the C-row centroid table and the pair join is an
    equi-join on bucket_id (never all-pairs), with C sized adaptively
    at the √n IVF operating point (fixed C=8 measured 7.7× wall-time
    for 10× vectors in the sf1 probe; adaptive C keeps within-bucket
    pairing ~n^1.5). Same clustering kernel as the lexical path
    (operators/cluster.py) fed by a different pair generator. The
    salted-MD5 centroid pick, adaptive-C formula, left-fold cosine,
    and argmax assignment are all bit-reproducible in DuckDB, so the
    oracle mirrors the bucketing exactly at every scale."""
    from .operators.cluster import dedup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = neardup.embedding_neardup_pairs_bucketed(
        emb, threshold=0.4
    ).select("id_a", "id_b")
    return dedup_clusters(
        emb.select("vec_id"), pairs, id_col="vec_id", pair_a="id_a", pair_b="id_b"
    ).select("vec_id", "cluster_id", "is_canonical")


# ---------------------------------------------------------------------------
# Exact prefix-filter set-similarity join (PPJoin candidate rule)
# ---------------------------------------------------------------------------

@query(
    "ext_dedup_prefix_filter",
    # Capped shingle CTE (operators/neardup.py ORACLE_SH_CAPPED):
    # prefix filtering is exact over whatever sets it is given, and
    # the sets both engines see are the capped ones.
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
def ext_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.5 via prefix filtering — same answer
    as the all-pairs shingle join (the oracle IS the all-pairs SQL:
    prefix filtering has no false negatives, exact verify kills false
    positives) with a quadratically smaller candidate join at scale.
    See operators/neardup.prefix_filter_jaccard_pairs."""
    docs = _t(spark, sf_dir, "documents")
    return neardup.prefix_filter_jaccard_pairs(docs, threshold=0.5)


# ---------------------------------------------------------------------------
# Global-percentile quality banding (two-pass broadcast-back filter)
# ---------------------------------------------------------------------------

_Q_TOKS = "string_split(text, ' ')"
_Q_SCORE = (
    "LEAST(1.0, len(toks) / 100.0) * 0.4"
    " + (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.3"
    " + LEAST(1.0, (CAST(len(list_filter(toks, s ->"
    " list_contains(['the','a','of','and','to','in','is'], s))) AS DOUBLE)"
    " / len(toks)) * 5.0) * 0.3"
)

@query(
    "ext_quality_band_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_Q_SCORE} AS quality_score
      FROM (SELECT doc_id, {_Q_TOKS} AS toks FROM documents)
    ),
    b AS (
      SELECT quantile_cont(quality_score, 0.05) AS q_lo,
             quantile_cont(quality_score, 0.95) AS q_hi
      FROM t
    )
    SELECT doc_id, quality_score, q_lo, q_hi
    FROM t, b
    WHERE quality_score >= q_lo AND quality_score <= q_hi
    """,
)
def ext_quality_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band quality filter: drop the bottom and top 5% of
    the corpus by quality score (junk below, boilerplate/templates
    above). Two-pass global-statistic pattern: pass 1 computes the
    exact p05/p95 (Spark ``percentile`` == DuckDB ``quantile_cont``,
    bit-exact linear interpolation), pass 2 broadcasts the 1-row
    bounds back over the corpus — the scale-correct way to apply a
    corpus-global threshold without collecting anything."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", T.quality_score(F.col("text")).alias("quality_score")
    )
    bounds = scored.agg(
        F.expr("percentile(quality_score, 0.05)").alias("q_lo"),
        F.expr("percentile(quality_score, 0.95)").alias("q_hi"),
    )
    return (
        scored.join(F.broadcast(bounds))
        .filter(
            (F.col("quality_score") >= F.col("q_lo"))
            & (F.col("quality_score") <= F.col("q_hi"))
        )
        .select("doc_id", "quality_score", "q_lo", "q_hi")
    )


# ---------------------------------------------------------------------------
# Identifier pseudonymization (privacy scrubbing pass)
# ---------------------------------------------------------------------------

@query(
    "ext_pii_pseudonymize",
    oracle="""
    SELECT event_id,
      md5('pii:' || CAST(user_id AS VARCHAR)) AS user_pseudo,
      regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_masked,
      CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT)
        AS n_digits_masked
    FROM events
    """,
)
def ext_pii_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy scrubbing over an event stream: salted-hash
    pseudonymization of the user id (stable join key, irreversible
    without the salt) + masking of every digit run in the free-form
    props payload, with an auditable masked-character count. Pure
    map-side JVM regex — character-class patterns behave identically
    in Java regex and RE2, and md5 hex is lowercase in both engines.
    The real-PII variant (emails/phones) is the same plan with richer
    patterns; fixtures carry no such strings, so digit runs are the
    testable stand-in."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.md5(F.concat(F.lit("pii:"), F.col("user_id").cast("string"))).alias(
            "user_pseudo"
        ),
        F.regexp_replace("props", "[0-9]+", "<NUM>").alias("props_masked"),
        (
            F.length("props") - F.length(F.regexp_replace("props", "[0-9]", ""))
        ).cast("long").alias("n_digits_masked"),
    )


# ---------------------------------------------------------------------------
# Temperature-balanced language resampling (multilingual mixing)
# ---------------------------------------------------------------------------

@query(
    "ext_lang_temperature_sample",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
    m AS (SELECT MIN(n_l) AS n_min FROM c),
    r AS (
      SELECT lang,
        CAST(FLOOR(10000 * sqrt(CAST(n_min AS DOUBLE) / CAST(n_l AS DOUBLE))) AS BIGINT)
          AS rate_per10k
      FROM c, m
    )
    SELECT d.doc_id, d.lang, r.rate_per10k
    FROM documents d JOIN r USING (lang)
    WHERE CAST(('0x' || substring(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 10000 < rate_per10k
    """,
)
def ext_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced multilingual resampling (α = 0.5): keep
    rate per language ∝ sqrt(n_min/n_l), so head languages are
    downsampled toward the tail (the mBERT/XLM-R exponent-smoothing
    recipe). Two-pass like the quality band: tiny per-language rate
    table broadcast back over the corpus; the keep decision is a pure
    salted-MD5 function of doc_id — stable across runs, engines, and
    corpus growth. sqrt and double division are correctly-rounded IEEE
    ops in both engines, so the rates are bit-identical (pow/ln would
    not be)."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.join(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            10000
            * F.sqrt(F.col("n_min").cast("double") / F.col("n_l").cast("double"))
        ).alias("rate_per10k"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    return (
        docs.join(F.broadcast(rates), ["lang"])
        .filter(bucket < F.col("rate_per10k"))
        .select("doc_id", "lang", "rate_per10k")
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (context-window packing / RAG prep)
# ---------------------------------------------------------------------------

@query(
    "ext_doc_chunking",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks, unnest(range(1, len(toks)+1, 48)) AS start
      FROM t
    )
    SELECT doc_id,
      CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
      array_to_string(toks[start:start+63], ' ') AS chunk_text,
      CAST(LEAST(64, len(toks) - start + 1) AS INT) AS n_chunk_tokens
    FROM starts
    """,
)
def ext_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into 64-token
    chunks with stride 48 (16-token overlap) — the tokenize-and-pack
    step before embedding or context-window training. One explode of
    a per-row integer sequence (no join, no shuffle: chunk count and
    boundaries are pure functions of the token count), so the plan is
    a single map stage that scales linearly and preserves the input
    partitioning."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    with_starts = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(48))).alias("_start"),
    )
    return with_starts.select(
        "doc_id",
        ((F.col("_start") - 1) / 48).cast("long").alias("chunk_id"),
        F.concat_ws(" ", F.slice("_toks", F.col("_start"), F.lit(64))).alias(
            "chunk_text"
        ),
        F.least(
            F.lit(64), F.size("_toks") - F.col("_start") + 1
        ).cast("int").alias("n_chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# Fixed-point class centroids over the embedding column
# ---------------------------------------------------------------------------

_SCALE = 1048576  # 2^20: exact in double, ~1e-6 quantization

@query(
    "ext_embedding_centroids",
    oracle=f"""
    WITH comp AS (
      SELECT label, s.pos AS pos,
        CAST(FLOOR(CAST(s.v AS DOUBLE) * {_SCALE}) AS BIGINT) AS q
      FROM (
        SELECT label,
          unnest(list_transform(range(1, len(embedding)+1),
                 i -> struct_pack(pos := i-1, v := embedding[i]))) AS s
        FROM embeddings
      )
    )
    SELECT label, pos,
      CAST(SUM(q) AS BIGINT) AS sum_scaled,
      COUNT(*) AS n,
      CAST(SUM(q) AS BIGINT) / (COUNT(*) * CAST({_SCALE} AS DOUBLE)) AS centroid
    FROM comp
    GROUP BY 1, 2
    """,
)
def ext_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the class-prototype
    primitive behind embedding-space curation (cluster purity checks,
    centroid-distance outlier pruning, IVF coarse quantizers).

    Element-wise mean via posexplode → groupBy(label, pos): partial
    aggregation makes it one shuffle of ~n_labels×dim rows regardless
    of corpus size. Cross-engine exactness: each float component is
    quantized to 2^-20 fixed point (float→double exact, ×2^20 exact,
    floor exact), summed as integers (order-independent), and the
    final division by n·2^20 is one correctly-rounded IEEE op — so the
    centroid is bit-identical in both engines with no decimal routing.
    At 100 TB the long sum would route through DECIMAL(38,0); fixture
    magnitudes stay far inside long range."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos", "_v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("_v").cast("double") * _SCALE).cast("long").alias("q"),
    )
    return comp.groupBy("label", "pos").agg(
        F.sum("q").alias("sum_scaled"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "label",
        "pos",
        "sum_scaled",
        "n",
        (
            F.col("sum_scaled").cast("double")
            / (F.col("n") * F.lit(float(_SCALE)))
        ).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# Multimodal → vector bridge: decode payloads, then similarity search
# ---------------------------------------------------------------------------

# md5-chain pixel hex for the real-PGM embed query: a 12×8 raster is
# 96 pixel bytes = 6 md5 blocks per document, mirrored verbatim in the
# oracle (duckdb md5() emits lowercase hex).
_PGM_EMBED_BLOCKS = " || ".join(
    f"md5(CAST(doc_id AS VARCHAR) || ':pgm{i}')" for i in range(6)
)


@query(
    "ext_media_embed_topk",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, {_PGM_EMBED_BLOCKS} AS pix
      FROM documents
    ),
    px AS (
      SELECT media_id,
        list_transform(range(0, 96), i ->
          (strpos('0123456789abcdef',
                  substring(pix, CAST(i AS BIGINT) * 2 + 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
                    substring(pix, CAST(i AS BIGINT) * 2 + 2, 1)) - 1)
        ) AS vals
      FROM m
    ),
    feat AS (
      SELECT media_id,
        list_transform(range(0, 8), j ->
          CAST(len(list_filter(vals, v -> v // 32 = j)) AS DOUBLE) / 96.0
        ) AS f
      FROM px
    ),
    scored AS (
      SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
        {neardup.oracle_cosine_sql("q.f", "c.f")} AS cosine_sim
      FROM feat q JOIN feat c ON q.media_id != c.media_id
      WHERE q.media_id < 10
    )
    SELECT query_id, neighbor_id, cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ext_media_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the REAL codec path
    (``fake=False``, r10 — previously the byte-histogram stand-in):
    build a genuine 12×8 binary PGM per document JVM-side (md5-chain
    pixel bytes under the canonical netpbm header —
    attach_pgm_payload), decode it with the real netpbm codec through
    Arrow mapInPandas into pixel-value histogram features (bin =
    value // 32, density = count/96 — one IEEE division), then exact
    cosine top-5 over the decoded features. The oracle replays the
    SAME pixels from the md5 chain in the hex domain (like
    ext_media_frames), so the header parse, raster decode, feature
    head, and broadcast top-k all sit on the value-checked path —
    bit-exact across engines."""
    from .multimodal.binary import attach_pgm_payload, decode_media

    docs = _t(spark, sf_dir, "documents")
    decoded = decode_media(attach_pgm_payload(docs), fake=False).select(
        "media_id", "feature"
    )
    queries_df = decoded.filter(F.col("media_id") < 10)
    return similarity.cosine_topk(
        decoded, queries_df, k=5, id_col="media_id", vec_col="feature"
    )


# ---------------------------------------------------------------------------
# kNN label prediction over embeddings (majority vote of top-k neighbors)
# ---------------------------------------------------------------------------

# the canonical cross-engine cosine fold (operators/neardup.py)
_COS = neardup.oracle_cosine_sql("q.embedding", "c.embedding")

@query(
    "ext_knn_label_predict",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.vec_id AS neighbor_id, c.label AS vote,
             {_COS} AS cosine_sim
      FROM e q JOIN e c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 100
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cosine_sim DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, true_label, vote, COUNT(*) AS n_votes
      FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id AS vec_id, true_label, vote AS predicted_label, n_votes
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY n_votes DESC, vote) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def ext_knn_label_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification over the embedding column: each query vector
    (vec_id < 100) takes the majority label of its 5 exact-cosine
    nearest neighbors (ties: larger vote count, then smaller label).
    The weak-supervision / label-propagation primitive of embedding-
    based curation. Reuses the broadcast top-k kernel
    (operators/similarity.cosine_topk); the fold cosine is bit-exact
    across engines, so the oracle checks values, not just shape."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 100)
    topk = similarity.cosine_topk(emb, queries_df, k=5)
    votes = (
        topk.join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("vote")
            ),
            ["neighbor_id"],
        )
        .groupBy("query_id", "vote")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "vote")
    pred = votes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return (
        pred.join(
            emb.select(F.col("vec_id"), F.col("label").alias("true_label")),
            pred["query_id"] == F.col("vec_id"),
        )
        .select("vec_id", "true_label", F.col("vote").alias("predicted_label"), "n_votes")
    )


# Deferred oracle-nesting tokens (see registry.resolve_deferred_oracles):
# this module may be the first-imported, hence the last to finish — run
# the idempotent resolver so every token is spliced regardless of order.
from .registry import resolve_deferred_oracles as _rdo  # noqa: E402
_rdo()
del _rdo
