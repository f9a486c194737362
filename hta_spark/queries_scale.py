"""Scale-surface queries: decontamination, deterministic sketches,
mixture planning, grid range join — each paired with a DuckDB oracle that
re-states the same deterministic arithmetic (md5 hashes, integer bins,
single-division floats) so both engines agree bit-for-bit.

Engine-parity notes (same conventions as queries_pipeline):
- Spark integer ``/`` and DuckDB integer ``/`` both produce DOUBLE
  (true division); floors are explicit ``floor()`` in both engines
  because Spark's double->long CAST truncates while DuckDB's rounds.
- booleans stringify identically (Python bools on both fetch paths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.rangejoin import range_join_points
from .pipeline.decontaminate import (BLOOM_BITS_PER_KEY, BLOOM_K,
                                     BLOOM_M_LOG2, bloom_decontaminate,
                                     decontaminate)
from .pipeline.mix import mix_weights
from .pipeline.rules import rule_filter
from .pipeline.sample import BP, hash_bucket
from .pipeline.sketch import (hist_quantiles,
                              hist_quantiles_grouped, kmv_distinct)
from .queries_hta import ns_time


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _scratch_path(sf_dir: str, prefix: str) -> str:
    """Fixed per-(pid, sf) scratch path for materializing queries — ONE
    sanitization rule for every such query (two hand copies could drift
    into colliding cache paths)."""
    import os
    import tempfile
    tag = (os.path.basename(sf_dir.rstrip("/"))
           .replace(".", "_").replace("-", "_"))
    return os.path.join(tempfile.gettempdir(),
                        f"{prefix}_{os.getpid()}_{tag}")


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# -- benchmark decontamination ---------------------------------------------

EVAL_BP = 500      # 5% of documents act as the held-out benchmark
DECON_N = 5
DECON_THRESHOLD = 0.1


def q_decontaminate(spark, sf_dir):
    """Train/eval split by the deterministic md5 bucket (salt 'eval'),
    then per-train-doc 5-gram overlap against the eval set."""
    docs = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), "eval")
    train = docs.filter(b >= F.lit(EVAL_BP))
    ev = docs.filter(b < F.lit(EVAL_BP))
    return decontaminate(train, ev, n=DECON_N, threshold=DECON_THRESHOLD)


SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                               i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))
             AS gram
  FROM toks WHERE len(t) >= {DECON_N}
),
split AS (
  SELECT doc_id,
         ('0x' || substr(md5('eval|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % {BP} AS b
  FROM documents
),
ev AS (
  SELECT DISTINCT g.gram FROM grams g JOIN split s USING (doc_id)
  WHERE s.b < {EVAL_BP}
),
tr AS (SELECT doc_id FROM split WHERE b >= {EVAL_BP}),
per AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(ev.gram) AS BIGINT) AS n_hit
  FROM grams g JOIN tr USING (doc_id)
  LEFT JOIN ev ON g.gram = ev.gram
  GROUP BY 1
)
SELECT t.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_hit, 0) AS n_hit,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS overlap_frac,
       (CASE WHEN coalesce(n_grams, 0) > 0
             THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
             ELSE 0.0 END) >= {DECON_THRESHOLD} AS contaminated
FROM tr t LEFT JOIN per USING (doc_id)
"""


# -- Bloom-filter decontamination -------------------------------------------
#
# Oracle-parity model: a bit of the 2^BLOOM_M_LOG2-bit filter is set iff
# SOME eval gram's Kirsch–Mitzenmacher probe lands on it, so the bitset IS
# the distinct set of eval probe positions — DuckDB never needs the packed
# long-array representation, only the same md5/conv/% position arithmetic
# (both digest halves, h2 forced odd BEFORE the power-of-two mod).

_BLOOM_M = 1 << BLOOM_M_LOG2


def _bloom_pos_sql(hash_cte: str, m_expr: str | None = None) -> str:
    """Positions CTE body: ``hash_cte`` must expose (gram, h=md5('bloom|'||
    gram)); emits one row per (gram, probe i) with the probed bit index —
    the exact integer recurrence of ``_bloom_hash_pair`` (a + i*b mod m on
    mod-reduced a, odd-forced b: values < 2^23 at the fixed default, no
    overflow in either engine; h halves are < 2^60 and m <= 2^30, so the
    products stay < 2^63 for any auto-sized m too).  ``m_expr`` overrides
    the fixed ``2^BLOOM_M_LOG2`` modulus with a SQL expression — a scalar
    subquery when the bitset auto-sizes from the key count (ADVICE r13:
    q_neardup_bloom's fixed 2^20 saturates past ~10^5 seen docs)."""
    m = m_expr if m_expr is not None else str(_BLOOM_M)
    return f"""
  SELECT gram,
         ((('0x' || substr(h, 1, 15))::BIGINT % {m})
          + i.range * ((('0x' || substr(h, 17, 15))::BIGINT * 2 + 1)
                       % {m})) % {m} AS pos
  FROM {hash_cte}, range({BLOOM_K}) i"""


_SQL_BLOOM_COMMON = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                               i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))
             AS gram
  FROM toks WHERE len(t) >= {DECON_N}
),
split AS (
  SELECT doc_id,
         ('0x' || substr(md5('eval|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % {BP} AS b
  FROM documents
),
ev AS (
  SELECT DISTINCT g.gram FROM grams g JOIN split s USING (doc_id)
  WHERE s.b < {EVAL_BP}
),
tr AS (SELECT doc_id FROM split WHERE b >= {EVAL_BP}),
epos AS (
  SELECT DISTINCT pos FROM ({_bloom_pos_sql(
      "(SELECT gram, md5('bloom|' || gram) AS h FROM ev)")})
),
tg AS (SELECT DISTINCT g.gram FROM grams g JOIN tr USING (doc_id)),
tprobe AS ({_bloom_pos_sql(
    "(SELECT gram, md5('bloom|' || gram) AS h FROM tg)")}),
hitg AS (
  SELECT p.gram FROM tprobe p LEFT JOIN epos e ON p.pos = e.pos
  GROUP BY p.gram HAVING count(e.pos) = {BLOOM_K}
),
perb AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(h.gram) AS BIGINT) AS n_hit
  FROM grams g JOIN tr USING (doc_id)
  LEFT JOIN hitg h ON g.gram = h.gram
  GROUP BY 1
)"""


def q_decontaminate_bloom(spark, sf_dir):
    """The exact same train/eval split as ``decontaminate_overlap``,
    answered by the ZERO-SHUFFLE Bloom path: per-train-doc report where
    ``n_hit`` may over-count by the filter's deterministic false positives
    (never under-counts — contamination errs toward dropping)."""
    docs = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), "eval")
    train = docs.filter(b >= F.lit(EVAL_BP))
    ev = docs.filter(b < F.lit(EVAL_BP))
    return bloom_decontaminate(train, ev, n=DECON_N,
                               threshold=DECON_THRESHOLD)


SQL_DECONTAMINATE_BLOOM = _SQL_BLOOM_COMMON + f"""
SELECT t.doc_id,
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_hit, 0) AS n_hit,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS overlap_frac,
       (CASE WHEN coalesce(n_grams, 0) > 0
             THEN CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
             ELSE 0.0 END) >= {DECON_THRESHOLD} AS contaminated
FROM tr t LEFT JOIN perb USING (doc_id)
"""


def q_decontaminate_bloom_fp(spark, sf_dir):
    """The Bloom path's measured false-positive rate against the exact
    path, as one summary row — the quality gate for the approximate
    operator (same pattern as ``dedup_lsh_recall`` / ``ann_ivf_recall``):
    gram-level FP rate over truly-clean probes plus the doc-level flag
    flips the over-count causes."""
    docs = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), "eval")
    train = docs.filter(b >= F.lit(EVAL_BP))
    ev = docs.filter(b < F.lit(EVAL_BP))
    exact = (decontaminate(train, ev, n=DECON_N, threshold=DECON_THRESHOLD)
             .select("doc_id", "n_grams", F.col("n_hit").alias("_xh"),
                     F.col("contaminated").alias("_xc")))
    bloom = (bloom_decontaminate(train, ev, n=DECON_N,
                                 threshold=DECON_THRESHOLD)
             .select("doc_id", F.col("n_hit").alias("_bh"),
                     F.col("contaminated").alias("_bc")))
    g, xh, bh = (F.sum("n_grams").cast("long"), F.sum("_xh").cast("long"),
                 F.sum("_bh").cast("long"))
    return (exact.join(bloom, "doc_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        g.alias("n_grams"),
        xh.alias("n_hit_exact"),
        bh.alias("n_hit_bloom"),
        (bh - xh).alias("fp_grams"),
        F.when(g - xh > 0, (bh - xh).cast("double")
               / (g - xh).cast("double"))
        .otherwise(F.lit(0.0)).alias("fp_rate"),
        F.sum(F.col("_xc").cast("long")).cast("long")
        .alias("n_contaminated_exact"),
        F.sum(F.col("_bc").cast("long")).cast("long")
        .alias("n_contaminated_bloom"),
        F.sum((F.col("_bc") & ~F.col("_xc")).cast("long")).cast("long")
        .alias("n_flag_flips")))


SQL_DECONTAMINATE_BLOOM_FP = _SQL_BLOOM_COMMON + f""",
perx AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(ev.gram) AS BIGINT) AS n_hit
  FROM grams g JOIN tr USING (doc_id)
  LEFT JOIN ev ON g.gram = ev.gram
  GROUP BY 1
),
docs_j AS (
  SELECT t.doc_id,
         coalesce(x.n_grams, 0) AS ng,
         coalesce(x.n_hit, 0) AS xh,
         coalesce(bb.n_hit, 0) AS bh,
         (CASE WHEN coalesce(x.n_grams, 0) > 0
               THEN CAST(x.n_hit AS DOUBLE) / CAST(x.n_grams AS DOUBLE)
               ELSE 0.0 END) >= {DECON_THRESHOLD} AS xc,
         (CASE WHEN coalesce(bb.n_grams, 0) > 0
               THEN CAST(bb.n_hit AS DOUBLE) / CAST(bb.n_grams AS DOUBLE)
               ELSE 0.0 END) >= {DECON_THRESHOLD} AS bc
  FROM tr t LEFT JOIN perx x USING (doc_id) LEFT JOIN perb bb USING (doc_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ng) AS BIGINT) AS n_grams,
       CAST(sum(xh) AS BIGINT) AS n_hit_exact,
       CAST(sum(bh) AS BIGINT) AS n_hit_bloom,
       CAST(sum(bh) - sum(xh) AS BIGINT) AS fp_grams,
       CASE WHEN sum(ng) - sum(xh) > 0
            THEN CAST(CAST(sum(bh) - sum(xh) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(sum(ng) - sum(xh) AS BIGINT) AS DOUBLE)
            ELSE 0.0 END AS fp_rate,
       CAST(sum(CASE WHEN xc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated_exact,
       CAST(sum(CASE WHEN bc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated_bloom,
       CAST(sum(CASE WHEN bc AND NOT xc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flag_flips
FROM docs_j
"""


# -- streaming near-dup Bloom filter, driver-gated twin (r12) -----------------
#
# VERDICT r11 item 1: neardup_bloom_filter is the STREAMING near-dup
# surface (map-only probe of a broadcast bitset — runs unchanged on a
# streaming frame; stream ≡ batch pinned in tests/test_streaming_dedup).
# Its decision function is pure md5 arithmetic, so it IS SQL-expressible:
# this twin runs the operator itself on the batch documents table and the
# oracle replays the identical banding + Kirsch–Mitzenmacher probes.

def q_neardup_bloom(spark, sf_dir):
    """Per-crawl near-dup filter through the ZERO-SHUFFLE Bloom path:
    the seen 40%'s band index compiles to one broadcast bitset and the
    incoming 60% keep docs whose band keys hit nothing.  The bitset
    AUTO-SIZES from the distinct band-key count (``sized_m_log2`` —
    ADVICE r13: the old explicit 2^20 saturates around ~10^5 seen docs,
    where the fill guard would refuse while the oracle kept replaying
    the saturated layout; now BOTH sides derive m from the key count,
    so the query has no sf ceiling short of the 2^30 broadcast cap) and
    the probe adopts m/k from the bitset frame's parameter columns.
    False positives drop a bounded fraction of novel docs (the oracle
    replays them exactly); false negatives are impossible."""
    from .pipeline.dedup import lsh_band_buckets, minhash_signatures
    from .queries_pipeline import (LSH_ROWS_PER_BAND, MINHASH_K,
                                   NEARDUP_SEEN_BP)
    from .streaming.dedup_stream import (neardup_bloom_filter,
                                         neardup_index_bitset)
    docs = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), "nd")
    seen = docs.filter(b < F.lit(NEARDUP_SEEN_BP))
    incoming = docs.filter(b >= F.lit(NEARDUP_SEEN_BP))
    idx = lsh_band_buckets(minhash_signatures(seen, k=MINHASH_K),
                           k=MINHASH_K, rows_per_band=LSH_ROWS_PER_BAND)
    return neardup_bloom_filter(
        incoming, neardup_index_bitset(idx, m_log2=None),
        k=MINHASH_K, rows_per_band=LSH_ROWS_PER_BAND) \
        .select("doc_id", "lang", "source", "n_chars")


def _sql_neardup_bloom() -> str:
    from .queries_pipeline import (LSH_ROWS_PER_BAND, MINHASH_K,
                                   NEARDUP_SEEN_BP, SQL_SHINGLES)
    hcols = ",\n         ".join(
        f"min(('0x' || substr(md5('{s // 2}|' || sh), "
        f"{1 if s % 2 == 0 else 17}, 15))::BIGINT) AS mh_{s}"
        for s in range(MINHASH_K))
    bands = MINHASH_K // LSH_ROWS_PER_BAND
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id AS id, {b} AS band, "
        f"md5(mh_{b * LSH_ROWS_PER_BAND}::VARCHAR || ',' || "
        f"mh_{b * LSH_ROWS_PER_BAND + 1}::VARCHAR) AS bh FROM sigs"
        for b in range(bands))
    return f"""
WITH {SQL_SHINGLES},
sigs AS (
  SELECT doc_id,
         {hcols}
  FROM ex GROUP BY doc_id
),
buckets AS (
{band_rows}
),
split AS (
  SELECT doc_id,
         ('0x' || substr(md5('nd|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % 10000 AS b
  FROM documents
),
kb AS (
  SELECT DISTINCT CAST(bk.band AS VARCHAR) || ':' || bk.bh AS gram
  FROM buckets bk JOIN split s ON s.doc_id = bk.id
  WHERE s.b < {NEARDUP_SEEN_BP}
),
msz AS (
  -- sized_m_log2 replayed exactly: max({BLOOM_M_LOG2},
  -- bit_length(max(n,1)*{BLOOM_BITS_PER_KEY} - 1)); bin() length IS
  -- the bit length for positive ints
  SELECT (1::BIGINT << GREATEST({BLOOM_M_LOG2},
          length(bin(GREATEST(count(*), 1)
                     * {BLOOM_BITS_PER_KEY} - 1)))) AS m
  FROM kb
),
epos AS (
  SELECT DISTINCT pos FROM ({_bloom_pos_sql(
      "(SELECT gram, md5('bloom|' || gram) AS h FROM kb)",
      m_expr="(SELECT m FROM msz)")})
),
ig AS (
  SELECT bk.id, CAST(bk.band AS VARCHAR) || ':' || bk.bh AS gram
  FROM buckets bk JOIN split s ON s.doc_id = bk.id
  WHERE s.b >= {NEARDUP_SEEN_BP}
),
igr AS (SELECT DISTINCT gram FROM ig),
iprobe AS ({_bloom_pos_sql(
    "(SELECT gram, md5('bloom|' || gram) AS h FROM igr)",
    m_expr="(SELECT m FROM msz)")}),
hitg AS (
  SELECT p.gram FROM iprobe p LEFT JOIN epos e ON p.pos = e.pos
  GROUP BY p.gram HAVING count(e.pos) = {BLOOM_K}
),
dropped AS (SELECT DISTINCT id FROM ig JOIN hitg USING (gram))
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN split sp USING (doc_id)
WHERE sp.b >= {NEARDUP_SEEN_BP}
  AND NOT EXISTS (SELECT 1 FROM dropped WHERE dropped.id = d.doc_id)
"""


# -- cross-corpus incremental dedup ------------------------------------------

SEEN_BP = 4000   # 40% of docs act as the already-ingested corpus


def q_dedup_incremental(spark, sf_dir):
    """Per-crawl "new documents only": the incoming 60% anti-joined
    against the already-seen 40% on a leading-5-token prefix key (the
    boilerplate-collapse key, which actually overlaps across the split —
    full-content hashes are unique in this corpus, so they would gate a
    no-op).  Returns the surviving incoming docs with their key."""
    from .pipeline.dedup import dedup_against, tokens_col
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    b = hash_bucket(F.col("doc_id"), "seen")
    seen = docs.filter(b < F.lit(SEEN_BP))
    incoming = docs.filter(b >= F.lit(SEEN_BP))
    key_of = (lambda t: F.md5(F.concat_ws(
        " ", F.slice(tokens_col(t), 1, 5))))
    out = dedup_against(incoming, seen, key_of=key_of)
    return out.select("doc_id", "content_hash")


SQL_DEDUP_INCREMENTAL = f"""
WITH h AS (
  SELECT doc_id,
         md5(array_to_string(string_split(lower(trim(text)), ' ')[1:5],
                             ' ')) AS content_hash,
         ('0x' || substr(md5('seen|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % {BP} AS b
  FROM documents
)
SELECT i.doc_id, i.content_hash
FROM h i
WHERE i.b >= {SEEN_BP}
  -- NOT EXISTS, not NOT IN: a NULL key (null text) must stay on the
  -- incoming side exactly like Spark's left_anti keeps it, whereas one
  -- NULL inside a NOT IN list silently drops EVERY row
  AND NOT EXISTS (SELECT 1 FROM h s
                  WHERE s.b < {SEEN_BP}
                    AND s.content_hash = i.content_hash)
"""


# -- per-domain document cap -------------------------------------------------

CAP_K = 10


def q_domain_cap(spark, sf_dir):
    """The web-curation per-domain cap: at most CAP_K docs per source,
    selected by the deterministic md5 shuffle order (rerun/partitioning
    invariant; WindowGroupLimit keeps per-task shuffle volume at
    O(groups x k))."""
    from .pipeline.sample import group_cap
    return (group_cap(_docs(spark, sf_dir), CAP_K)
            .select("source", "doc_id"))


SQL_DOMAIN_CAP = f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY
             ('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)), 1, 15))
                 ::BIGINT,
             doc_id) AS rk
  FROM documents
)
SELECT source, doc_id FROM r WHERE rk <= {CAP_K}
"""


# -- PII redaction -----------------------------------------------------------


def q_pii_scrub(spark, sf_dir):
    """C4-style PII scrub over the documents table: per-doc match counts
    plus an md5 of the scrubbed text (the hash keeps the gated rows small
    while pinning every replacement byte-for-byte)."""
    from .pipeline.redact import pii_scrub
    out = pii_scrub(_docs(spark, sf_dir))
    return out.select("doc_id", "n_emails", "n_ipv4", "n_digit_runs",
                      F.md5("text_scrubbed").alias("scrub_hash"))


SQL_PII_SCRUB = """
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text,
              '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))
              AS BIGINT) AS n_ipv4,
         CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT)
             AS n_digit_runs,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
             '<IP>', 'g'),
           '[0-9]{7,}', '<ID>', 'g') AS scrubbed
  FROM documents
)
SELECT doc_id, n_emails, n_ipv4, n_digit_runs, md5(scrubbed) AS scrub_hash
FROM s
"""


# -- hashed linear classifier scoring ---------------------------------------

CLS_THRESHOLD = 0.0


def q_classifier_score(spark, sf_dir):
    """fasttext-style quality scoring over the documents table with the
    deterministic hash-derived pseudo-model (pipeline/classify.py) — the
    whole tokenize -> hash -> fold -> normalize -> threshold pipeline in
    one map-only pass, oracle-mirrored integer-for-integer."""
    from .pipeline.classify import hashed_linear_score
    return hashed_linear_score(_docs(spark, sf_dir),
                               threshold=CLS_THRESHOLD)


SQL_CLASSIFIER_SCORE = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
),
tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
w AS (
  SELECT doc_id,
         (('0x' || substr(md5('w|' || CAST(
              ('0x' || substr(md5('feat|' || tok), 1, 15))::BIGINT % 4096
            AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000 AS wi
  FROM tok
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(wi) AS BIGINT) AS w_sum
  FROM w GROUP BY 1
)
-- LEFT JOIN back to documents: NULL text tokenizes to nothing (unnest of a
-- NULL list emits no rows), but the scorer keeps the doc as the empty
-- document (n_tokens=0, w_sum=0, score=0.0) — matches classify.py's
-- coalesce-to-empty-array (ADVICE r6)
SELECT d.doc_id, coalesce(per.n_tokens, 0) AS n_tokens,
       coalesce(per.w_sum, 0) AS w_sum,
       CASE WHEN coalesce(per.n_tokens, 0) > 0
            THEN CAST(per.w_sum AS DOUBLE) / CAST(1000 * per.n_tokens AS DOUBLE)
            ELSE 0.0 END AS score,
       CASE WHEN coalesce(per.n_tokens, 0) > 0
            THEN CAST(per.w_sum AS DOUBLE) / CAST(1000 * per.n_tokens AS DOUBLE)
            ELSE 0.0 END >= {CLS_THRESHOLD} AS keep
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


# -- KMV distinct sketch ----------------------------------------------------

KMV_K = 64


def q_kmv_distinct(spark, sf_dir):
    """Distinct users per event type: KMV estimate next to the exact
    count (the auditability check a monitoring pipeline runs)."""
    ev = _events(spark, sf_dir)
    est = kmv_distinct(ev, "user_id", ["event_type"], k=KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    return est.join(exact, "event_type")


SQL_KMV_DISTINCT = f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events
           WHERE user_id IS NOT NULL),
h AS (
  SELECT event_type,
         ('0x' || substr(md5('kmv|' || CAST(user_id AS VARCHAR)), 1, 15))
             ::BIGINT AS h
  FROM d
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
k AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         max(h) AS kth_hash
  FROM r WHERE rn <= {KMV_K} GROUP BY 1
),
e AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
             AS exact_distinct
  FROM events GROUP BY 1
)
SELECT k.event_type, n_kept, kth_hash,
       CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(KMV_K - 1)} * 1152921504606846976.0
                 / CAST(kth_hash AS DOUBLE) END AS kmv_distinct,
       exact_distinct
FROM k JOIN e USING (event_type)
"""


# -- histogram quantiles ----------------------------------------------------

HIST_QS = (0.25, 0.5, 0.75, 0.9, 0.99)
HIST_BINS = 64


def q_hist_quantiles(spark, sf_dir):
    return hist_quantiles(_events(spark, sf_dir), "value",
                          qs=HIST_QS, n_bins=HIST_BINS, scale=100)


SQL_HIST_QUANTILES = f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
),
b AS (SELECT min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS total
      FROM v),
wd AS (
  SELECT lo, hi, total,
         greatest(CAST(1 AS BIGINT),
                  ((hi - lo) // {HIST_BINS}) + 1) AS w
  FROM b
),
bins AS (
  SELECT ((v.v - wd.lo) // wd.w) AS bin,
         wd.lo, wd.w, wd.total, CAST(count(*) AS BIGINT) AS n
  FROM v, wd GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT bin, lo, w, total, n,
         sum(n) OVER (ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum
  FROM bins
),
qs AS (SELECT CAST(q AS DOUBLE) AS q,
              CAST(q * 1000000 AS BIGINT) AS qm
       FROM (SELECT unnest([{', '.join(str(q) for q in HIST_QS)}]) AS q)),
tr AS (
  SELECT cum.*, qs.q,
         (cum.total * qs.qm + 999999) // 1000000 AS target_rank
  FROM cum, qs
)
SELECT q, target_rank,
       (CAST(lo + bin * w AS DOUBLE)
        + CAST(w AS DOUBLE)
          * (CAST(target_rank - (cum - n) AS DOUBLE)
             / CAST(n AS DOUBLE)))
       / 100.0 AS est
FROM tr
WHERE (cum - n) < target_rank AND target_rank <= cum
ORDER BY q
"""


def q_hist_by_group(spark, sf_dir):
    """p50/p90/p99 of value PER EVENT TYPE from the grouped integer
    histogram — parallel across groups, n_bins-bounded within one."""
    return hist_quantiles_grouped(_events(spark, sf_dir), "value",
                                  ["event_type"], qs=(0.5, 0.9, 0.99),
                                  n_bins=HIST_BINS, scale=100)


SQL_HIST_BY_GROUP = f"""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL
),
b AS (
  SELECT event_type, min(v) AS lo, max(v) AS hi,
         CAST(count(*) AS BIGINT) AS total
  FROM v GROUP BY 1
),
wd AS (
  SELECT event_type, lo, hi, total,
         greatest(CAST(1 AS BIGINT),
                  ((hi - lo) // {HIST_BINS}) + 1) AS w
  FROM b
),
bins AS (
  SELECT v.event_type, ((v.v - wd.lo) // wd.w) AS bin,
         wd.lo, wd.w, wd.total, CAST(count(*) AS BIGINT) AS n
  FROM v JOIN wd USING (event_type) GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT event_type, bin, lo, w, total, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum
  FROM bins
),
qs AS (SELECT CAST(q AS DOUBLE) AS q,
              CAST(q * 1000000 AS BIGINT) AS qm
       FROM (SELECT unnest([0.5, 0.9, 0.99]) AS q)),
tr AS (
  SELECT cum.*, qs.q,
         (cum.total * qs.qm + 999999) // 1000000 AS target_rank
  FROM cum, qs
)
SELECT event_type, q, target_rank,
       (CAST(lo + bin * w AS DOUBLE)
        + CAST(w AS DOUBLE)
          * (CAST(target_rank - (cum - n) AS DOUBLE)
             / CAST(n AS DOUBLE)))
       / 100.0 AS est
FROM tr
WHERE (cum - n) < target_rank AND target_rank <= cum
ORDER BY event_type, q
"""


# -- mixture planning -------------------------------------------------------

MIX_TARGETS = {"src0": 0.3, "src1": 0.2, "src2": 0.2, "src3": 0.1,
               "src4": 0.1, "src5": 0.05, "src6": 0.05}
MIX_BUDGET = 20_000


def q_mix_weights(spark, sf_dir):
    return mix_weights(_docs(spark, sf_dir), MIX_TARGETS, MIX_BUDGET)


_MIX_VALUES = ", ".join(f"('{s}', {sh})" for s, sh in
                        sorted(MIX_TARGETS.items()))

SQL_MIX_WEIGHTS = f"""
WITH have AS (
  SELECT source,
         CAST(sum(len(string_split(lower(trim(text)), ' '))) AS BIGINT)
             AS source_tokens,
         CAST(count(*) AS BIGINT) AS source_docs
  FROM documents GROUP BY 1
),
tgt AS (SELECT source, CAST(share AS DOUBLE) AS share
        FROM (VALUES {_MIX_VALUES}) AS v(source, share)),
ts AS (SELECT sum(share) AS tsh FROM tgt),
j AS (
  SELECT coalesce(have.source, tgt.source) AS source,
         coalesce(source_tokens, 0) AS source_tokens,
         coalesce(source_docs, 0) AS source_docs,
         coalesce(share, 0.0) AS share
  FROM have FULL OUTER JOIN tgt ON have.source = tgt.source
)
SELECT source, source_tokens, source_docs, share,
       CASE WHEN source_tokens > 0 THEN
         least(CAST({BP} AS BIGINT),
               CAST(floor({BP}.0 * ({float(MIX_BUDGET)} * share
                                    / (SELECT tsh FROM ts))
                          / CAST(source_tokens AS DOUBLE)) AS BIGINT))
       ELSE CAST(0 AS BIGINT) END AS rate_bp,
       CAST(floor(source_tokens
                  * (CASE WHEN source_tokens > 0 THEN
                       least(CAST({BP} AS BIGINT),
                             CAST(floor({BP}.0 * ({float(MIX_BUDGET)} * share
                                                  / (SELECT tsh FROM ts))
                                        / CAST(source_tokens AS DOUBLE))
                                  AS BIGINT))
                     ELSE CAST(0 AS BIGINT) END)
                  / {BP}) AS BIGINT) AS expect_tokens
FROM j
"""


# -- grid range join --------------------------------------------------------

HOUR_NS = 3_600_000_000_000
CELL_NS = 900_000_000_000  # 15 min


def q_range_join_incidents(spark, sf_dir):
    """Every error event opens a 1-hour incident window; count the events
    and distinct users inside each window via the grid-bucketed equi-join
    (no nested-loop join anywhere in the plan)."""
    ev = _events(spark, sf_dir)
    t = ns_time(ev)
    pts = ev.select(t.alias("t"), "user_id")
    inc = (ev.filter(F.col("event_type") == "error")
           .select(F.col("event_id").alias("incident_id"),
                   t.alias("b"), (t + F.lit(HOUR_NS)).alias("en")))
    joined = range_join_points(pts, inc, "t", "b", "en", cell=CELL_NS)
    return joined.groupBy("incident_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.count_distinct("user_id").cast("long").alias("n_users"))


SQL_RANGE_JOIN = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS t
           FROM events),
inc AS (
  SELECT event_id AS incident_id, t AS b, t + {HOUR_NS} AS en
  FROM e WHERE event_type = 'error'
)
SELECT i.incident_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
FROM inc i JOIN e p ON p.t >= i.b AND p.t < i.en
GROUP BY 1
"""


# -- rule-based quality filtering ------------------------------------------

def q_text_rules(spark, sf_dir):
    return rule_filter(_docs(spark, sf_dir))


SQL_TEXT_RULES = """
WITH toks AS (
  SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS t
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(t, x -> len(x))), 0)
              AS BIGINT) AS word_chars,
         CAST(len(list_filter(t, x -> regexp_full_match(x, '[a-z]+')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT)
             AS symbol_chars,
         CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT)
             AS n_urls,
         CAST(len(regexp_extract_all(
                  text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT)
             AS n_emails,
         CAST(len(regexp_extract_all(
                  text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT)
             AS n_bpe_tokens
  FROM toks
)
SELECT doc_id, n_words, word_chars,
       CASE WHEN n_words > 0
            THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
            ELSE 0.0 END AS mean_word_len,
       n_alpha_words,
       CASE WHEN n_words > 0
            THEN CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)
            ELSE 0.0 END AS alpha_frac,
       symbol_chars,
       CASE WHEN n_chars > 0
            THEN CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS symbol_frac,
       n_urls, n_emails, n_bpe_tokens,
       COALESCE(n_words >= 5 AND n_words <= 100000
        AND CASE WHEN n_words > 0
             THEN CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
             ELSE 0.0 END BETWEEN 2.0 AND 12.0
        AND CASE WHEN n_words > 0
             THEN CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE)
             ELSE 0.0 END >= 0.6
        AND CASE WHEN n_chars > 0
             THEN CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE)
             ELSE 0.0 END <= 0.2, FALSE)
           AS keep
FROM s
"""


# -- bucketed (shuffle-free) join ------------------------------------------

N_BUCKETS = 8


def q_bucketed_join(spark, sf_dir):
    """Revenue by (order priority, return flag) through BUCKETED lineitem
    and orders tables: both sides are hash-bucketed on the order key at
    write time, so the join itself runs with zero Exchange (plan-tested in
    tests/test_scale_ops.py) — the layout a 100 TB warehouse gives its
    biggest recurring join.  Tables materialize once per session at a
    fixed per-(pid, sf) path, like the streaming ingest query."""
    import os

    from .sources.bucketed import ensure_bucketed
    base = _scratch_path(sf_dir, "hta_bucketed")
    tag = os.path.basename(base).split("_", 2)[2]
    li = ensure_bucketed(
        spark, f"bkt_lineitem_{tag}", f"{base}/lineitem",
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        ["l_orderkey"], N_BUCKETS)
    orders = ensure_bucketed(
        spark, f"bkt_orders_{tag}", f"{base}/orders",
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        ["o_orderkey"], N_BUCKETS)
    # per-row cent quantization -> exact integer sum (the module's
    # order-robust convention; a double SUM's partial-aggregation order
    # differs between engines and can flip round(.,2) at a boundary)
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("long")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority", "l_returnflag")
            .agg((F.sum(cents).cast("double") / F.lit(100.0))
                 .alias("revenue"),
                 F.count("*").cast("long").alias("n_items")))


SQL_BUCKETED_JOIN = """
SELECT o_orderpriority, l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# -- vocabulary / heavy hitters ---------------------------------------------

VOCAB_TOP = 50


def q_text_vocab(spark, sf_dir):
    """Corpus vocabulary: top tokens by frequency with corpus-coverage
    fractions — the heavy-hitters pass behind tokenizer/vocab builds.
    Exact via one map-side-combined token count (distinct tokens, not
    corpus size, bound the shuffle); ranks break ties by token for
    determinism.

    Scale note (VERDICT r3 #1): the global top-k is orderBy().limit(),
    which Spark compiles to TakeOrderedAndProject — a per-partition
    heap top-k merged on the driver, never a single-partition sort of
    the full distinct-token set.  Only the <= VOCAB_TOP survivors see
    the rank window, partitioned by the constant `_total` ATTRIBUTE (a
    literal key would be constant-folded away, re-creating the
    partitionless-window plan)."""
    from pyspark.sql import Window
    from .pipeline.dedup import tokens_col
    docs = _docs(spark, sf_dir)
    toks = (docs.select(F.explode(tokens_col(F.col("text")))
                        .alias("token"))
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("cnt")))
    total = toks.agg(F.sum("cnt").cast("long").alias("_total"))
    top = toks.orderBy(F.desc("cnt"), F.col("token")).limit(VOCAB_TOP)
    # ``_total`` is constant over the <= VOCAB_TOP survivors: one window
    # group via a real attribute (a literal key would be folded away and
    # the empty spec makes WindowExec WARN)
    w = Window.partitionBy("_total").orderBy(F.desc("cnt"), F.col("token"))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "token", "cnt",
                    (F.col("cnt").cast("double")
                     / F.col("_total").cast("double")).alias("coverage")))


SQL_TEXT_VOCAB = f"""
WITH toks AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
  FROM documents
),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
r AS (
  SELECT token, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
             AS rank
  FROM c
)
SELECT rank, token, cnt,
       CAST(cnt AS DOUBLE) / CAST((SELECT total FROM t) AS DOUBLE)
           AS coverage
FROM r WHERE rank <= {VOCAB_TOP}
"""


# -- BPE merge training (tokenizer construction) ----------------------------

BPE_MERGES = 8


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training: the first ``BPE_MERGES`` BPE merges over the
    corpus (pair counting -> merge top pair -> re-segment, unrolled-rounds
    oracle like ann_kmeans_lite; see :mod:`hta_spark.pipeline.bpe` for the
    scale shape and the documented replace-semantics convention)."""
    from .pipeline.bpe import bpe_train
    return bpe_train(_docs(spark, sf_dir), n_merges=BPE_MERGES)


def _bpe_sql(n_merges: int = BPE_MERGES) -> str:
    """Independent DuckDB restatement of q_bpe_merges: rounds unrolled
    into chained CTEs.  Pair extraction is a list-transform over symbol
    positions (vs Spark's HOF explode); the merge is the same literal
    space-bounded replace applied MERGE_PASSES (2) times, with the round's
    winning pair injected via scalar subqueries."""
    parts = ["""WITH toks AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS token
  FROM documents
),
v0 AS (
  SELECT ' ' || regexp_replace(token, '(.)', '\\1 ', 'g') AS repr,
         CAST(count(*) AS BIGINT) AS freq
  FROM toks WHERE token <> '' GROUP BY 1
)"""]
    round_tpl = """
p{i} AS (
  SELECT p.l AS lhs, p.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                  j -> struct_pack(l := syms[j], r := syms[j+1]))) AS p
    FROM (SELECT string_split(trim(repr), ' ') AS syms, freq FROM v{prev})
  ) GROUP BY 1, 2
),
t{i} AS MATERIALIZED (
  SELECT lhs, rhs, pair_count FROM p{i}
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
),
v{i} AS MATERIALIZED (
  SELECT replace(replace(repr,
           (SELECT ' ' || lhs || ' ' || rhs || ' ' FROM t{i}),
           (SELECT ' ' || lhs || rhs || ' ' FROM t{i})),
           (SELECT ' ' || lhs || ' ' || rhs || ' ' FROM t{i}),
           (SELECT ' ' || lhs || rhs || ' ' FROM t{i})) AS repr, freq
  FROM v{prev}
)"""
    for i in range(1, n_merges + 1):
        parts.append(round_tpl.format(i=i, prev=i - 1))
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, pair_count FROM t{i}"
        for i in range(1, n_merges + 1))
    return ",".join(parts) + "\n" + finals


SQL_BPE_MERGES = _bpe_sql()


def q_bpe_segment(spark, sf_dir):
    """Re-segment the corpus with the merges learned by q_bpe_merges:
    per-document BPE subword count vs whitespace token count (the trained
    tokenizer's token-budget view).  The K-row merge list is driver
    state by the documented tokenizer-sized convention; segmentation is
    K chained literal replaces over the distinct-token table
    broadcast-joined back onto the corpus."""
    from .pipeline.bpe import bpe_segment_counts, bpe_train
    docs = _docs(spark, sf_dir)
    merges = [(r["lhs"], r["rhs"])
              for r in bpe_train(docs, n_merges=BPE_MERGES)
              .orderBy("step").collect()]
    return bpe_segment_counts(docs, merges)


def _bpe_segment_sql(n_merges: int = BPE_MERGES) -> str:
    """Oracle for q_bpe_segment: the same unrolled merge chain as
    :func:`_bpe_sql`, then the K winning pairs applied in step order to a
    token-level repr table (scalar subqueries from each t{i}) and the
    subword counts summed per document."""
    base = _bpe_sql(n_merges)
    chain = base[:base.index("\nSELECT CAST(1 AS BIGINT)")]
    repl = "' ' || regexp_replace(token, '(.)', '\\1 ', 'g')"
    for i in range(1, n_merges + 1):
        pat = f"(SELECT ' ' || lhs || ' ' || rhs || ' ' FROM t{i})"
        rep = f"(SELECT ' ' || lhs || rhs || ' ' FROM t{i})"
        repl = f"replace(replace({repl}, {pat}, {rep}), {pat}, {rep})"
    return f"""{chain},
dtoks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
  FROM documents
),
dt AS (SELECT doc_id, token FROM dtoks WHERE token <> ''),
lut AS (
  SELECT token,
         CAST(len(string_split(trim({repl}), ' ')) AS BIGINT) AS n_sub
  FROM (SELECT DISTINCT token FROM dt)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords
FROM dt JOIN lut USING (token)
GROUP BY 1
"""


SQL_BPE_SEGMENT = _bpe_segment_sql()


# -- unigram LM surprisal ---------------------------------------------------

def q_unigram_surprisal(spark, sf_dir):
    """Per-document unigram surprisal under the corpus's own unigram LM —
    the language-model quality filter (high surprisal = unusual token
    mix).  ln(p) is quantized to MICRO-UNITS PER TOKEN TYPE before the
    per-document sum, so the sum is exact integer arithmetic (order-free
    across engines); the only float risk left is a last-ulp ln()
    difference landing exactly on a micro boundary (~1e-10 per distinct
    token — the same accepted class as round(4) cosines).  The LM is a
    broadcast vocab frame; scoring is one explode + broadcast join +
    grouped integer sum."""
    from .pipeline.dedup import tokens_col
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id",
                       F.explode(tokens_col(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("long").alias("_total"))
    lm = (vocab.crossJoin(F.broadcast(total))
          .select("token",
                  F.round(-F.log(F.col("cnt").cast("double")
                                 / F.col("_total").cast("double"))
                          * 1e6).cast("long").alias("micro_surprisal")))
    per_doc = (toks.join(F.broadcast(lm), "token")
               .groupBy("doc_id")
               .agg(F.count("*").cast("long").alias("n_tokens"),
                    F.sum("micro_surprisal").cast("long")
                    .alias("surprisal_micro")))
    nats = (F.col("surprisal_micro").cast("double")
            / F.col("n_tokens").cast("double"))
    return per_doc.select("doc_id", "n_tokens", "surprisal_micro",
                          (nats / F.lit(1e6)).alias("nats_per_token"))


SQL_UNIGRAM_SURPRISAL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
  FROM documents
),
vocab AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks
          GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
lm AS (
  SELECT token,
         CAST(round(-ln(CAST(cnt AS DOUBLE)
                        / CAST((SELECT total FROM t) AS DOUBLE)) * 1e6)
              AS BIGINT) AS micro_surprisal
  FROM vocab
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(micro_surprisal) AS BIGINT) AS surprisal_micro
  FROM toks JOIN lm USING (token) GROUP BY 1
)
SELECT doc_id, n_tokens, surprisal_micro,
       (CAST(surprisal_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 1e6
           AS nats_per_token
FROM per
"""


# -- dense global ids -------------------------------------------------------

def q_dense_ids(spark, sf_dir):
    """Global dense row ids over orders without a single-partition
    window: sorted durable write + parquet-footer offsets + per-file
    windows (`operators/ids.py`).  Writes to a fixed per-(pid, sf) path
    like the other materializing queries."""
    from .operators.ids import dense_ids
    path = _scratch_path(sf_dir, "hta_dense_ids")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (dense_ids(o, ["o_orderkey"], path)
            .select("o_orderkey", "o_orderpriority", "row_id"))


SQL_DENSE_IDS = """
SELECT o_orderkey, o_orderpriority,
       CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_id
FROM orders
"""


# -- semi-structured (JSON) extraction -------------------------------------

def q_json_props(spark, sf_dir):
    """Extract the JSON payload column at the scan and aggregate on it —
    the semi-structured pattern every event pipeline needs.  At 100 TB
    `get_json_object` runs in codegen per row (no Python); for hot keys
    the production move is extract-once-and-persist as a real column."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max"),
                 F.sum("k").cast("long").alias("k_sum"),
                 F.count_distinct("k").cast("long").alias("k_distinct")))


SQL_JSON_PROPS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_sum,
       CAST(count(DISTINCT CAST(json_extract_string(props, '$.k')
                                AS BIGINT)) AS BIGINT) AS k_distinct
FROM events GROUP BY 1
"""


# -- unpivot (wide -> long) -------------------------------------------------

def q_unpivot(spark, sf_dir):
    """Wide per-priority aggregates melted to (priority, measure, value)
    long format — `unpivot` is a zero-shuffle projection on top of the
    one grouped aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    wide = (o.groupBy("o_orderpriority")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .cast("long").alias("price_cents"),
                 F.count_distinct("o_custkey").cast("long")
                 .alias("n_custs")))
    return wide.unpivot("o_orderpriority",
                        ["n_orders", "price_cents", "n_custs"],
                        "measure", "value")


SQL_UNPIVOT = """
WITH wide AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
  FROM orders GROUP BY 1
)
UNPIVOT wide ON n_orders, price_cents, n_custs
INTO NAME measure VALUE value
"""


# -- time-based RANGE window frame -----------------------------------------

def q_range_frame(spark, sf_dir):
    """Trailing-1-hour per-user activity at every event: a RANGE window
    frame over the ns time axis (the window-frame variant rows-frames
    cannot express — ties and gaps follow event TIME, not row position).
    Sums use the exact cent-integer convention so the frame aggregation
    is order-free across engines."""
    from pyspark.sql import Window
    ev = _events(spark, sf_dir)
    t = ns_time(ev)
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select("user_id", "event_id", t.alias("t"),
                     cents.alias("c"))
    w = (Window.partitionBy("user_id").orderBy("t")
         .rangeBetween(-HOUR_NS, 0))
    return base.select(
        "user_id", "event_id", "t",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum("c").over(w).cast("long").alias("sum_1h_cents"))


SQL_RANGE_FRAME = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
)
SELECT user_id, event_id, t,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(c) OVER w AS BIGINT) AS sum_1h_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN {HOUR_NS} PRECEDING AND CURRENT ROW)
"""


# -- exact kNN self-join ----------------------------------------------------

KNN_K = 5


def q_knn_join(spark, sf_dir):
    from .pipeline.ann import knn_join
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_join(emb, k=KNN_K)


#: the exact-kNN ranking CTEs — ONE definition shared by the knn join and
#: the label-accuracy oracle built on it (two copies could silently
#: diverge on the ranking convention)
_KNN_CTES = """p AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 4) AS cs
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT a, b, cs,
         row_number() OVER (PARTITION BY a ORDER BY cs DESC, b) AS rk
  FROM p
)"""

SQL_KNN_JOIN = f"""
WITH {_KNN_CTES}
SELECT a, b, cs AS cos_sim, CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= {KNN_K}
"""


# -- kNN label-vote evaluation ----------------------------------------------

def q_knn_label_accuracy(spark, sf_dir):
    """Embedding-quality evaluation: predict each vector's label by
    majority vote of its exact k nearest neighbors (ties -> smaller
    label), report per-true-label accuracy — the standard labeled-kNN
    probe of an embedding space, built on the oracle-gated knn_join.
    Vote counting and the accuracy division are integer-exact; at scale
    the knn input swaps to the IVF probe path behind the same contract."""
    from .pipeline.ann import knn_join
    from pyspark.sql import Window
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nn = knn_join(emb, k=KNN_K)
    lab = emb.select(F.col("vec_id"), F.col("label").cast("int"))
    votes = (nn.join(lab.select(F.col("vec_id").alias("b"),
                                F.col("label").alias("nb_label")), "b")
             .groupBy("a", "nb_label")
             .agg(F.count(F.lit(1)).cast("long").alias("n_votes")))
    w = Window.partitionBy("a").orderBy(F.desc("n_votes"), "nb_label")
    pred = (votes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("a", F.col("nb_label").alias("pred")))
    truth = lab.select(F.col("vec_id").alias("a"),
                       F.col("label").alias("true_label"))
    return (pred.join(truth, "a")
            .groupBy("true_label")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.when(F.col("pred") == F.col("true_label"), 1)
                       .otherwise(0)).cast("long").alias("n_correct"))
            .select("true_label", "n", "n_correct",
                    F.round(F.col("n_correct").cast("double")
                            / F.col("n").cast("double"), 4)
                    .alias("accuracy")))


SQL_KNN_LABEL_ACCURACY = f"""
WITH {_KNN_CTES},
nn AS (SELECT a, b FROM r WHERE rk <= {KNN_K}),
votes AS (
  SELECT nn.a, e.label AS nb_label, CAST(count(*) AS BIGINT) AS n_votes
  FROM nn JOIN embeddings e ON nn.b = e.vec_id
  GROUP BY 1, 2
),
pred AS (
  SELECT a, nb_label AS pred FROM (
    SELECT a, nb_label,
           row_number() OVER (PARTITION BY a
                              ORDER BY n_votes DESC, nb_label) AS rk
    FROM votes) t WHERE rk = 1
)
SELECT e.label AS true_label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       round(CAST(sum(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS accuracy
FROM pred p JOIN embeddings e ON p.a = e.vec_id
GROUP BY 1
"""


# -- IVF-probed kNN join (the beyond-broadcast scale path) ------------------

KNN_NPROBE = 2


def q_knn_join_ivf(spark, sf_dir):
    """:func:`knn_join` routed through the IVF probe path — the plan 100 TB
    actually uses (centroid equi-join candidates + WindowGroupLimit
    top-k), oracle-gated so the driver sees the beyond-broadcast path,
    not just the exact GEMM baseline (VERDICT r3 item 4).  Centroids are
    the fixed seeded codebook (vec_id < 10) shared with ann_ivf_assign;
    nprobe=2 keeps the probe approximate (recall < 1), which the oracle
    mirrors candidate-for-candidate."""
    from .pipeline.ann import knn_join_ivf
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in emb.filter(F.col("vec_id") < 10)
             .select("vec_id", "embedding").collect()]
    return knn_join_ivf(emb, cents, k=KNN_K, nprobe=KNN_NPROBE)


SQL_KNN_JOIN_IVF = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id < 10
),
sim_c AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6) AS s
  FROM embeddings e CROSS JOIN c
),
member AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rk
    FROM sim_c) t WHERE rk = 1
),
probe AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rk
    FROM sim_c) t WHERE rk <= {KNN_NPROBE}
),
cand AS (
  SELECT p.vec_id AS a, m.vec_id AS b,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 4) AS cs
  FROM probe p
  JOIN member m ON p.cid = m.cid AND p.vec_id <> m.vec_id
  JOIN embeddings ea ON ea.vec_id = p.vec_id
  JOIN embeddings eb ON eb.vec_id = m.vec_id
),
r AS (
  SELECT a, b, cs,
         row_number() OVER (PARTITION BY a ORDER BY cs DESC, b) AS rk
  FROM cand
)
SELECT a, b, cs AS cos_sim, CAST(rk AS BIGINT) AS rank
FROM r WHERE rk <= {KNN_K}
"""


# -- end-to-end curation funnel --------------------------------------------

SAMPLE_BP = 5000  # final deterministic 50% sample


def q_pipeline_funnel(spark, sf_dir):
    """The whole curation pipeline as ONE declarative plan, reported as
    the per-source funnel every corpus build publishes: train-split docs
    -> structural rules -> exact-dedup keepers -> decontamination ->
    deterministic 50% sample.  Every stage is one of the registry's
    oracle-gated operators composed on doc_id; all outputs are integer
    counts (order-robust by construction)."""
    from .pipeline.dedup import normalize_text
    docs = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), "eval")
    train = docs.filter(b >= F.lit(EVAL_BP))
    evald = docs.filter(b < F.lit(EVAL_BP))
    rules = rule_filter(train).select("doc_id", "keep")
    t1 = train.join(rules, "doc_id").filter(F.col("keep")).drop("keep")
    keepers = (t1.groupBy(F.md5(normalize_text(F.col("text")))
                          .alias("_h"))
               .agg(F.min("doc_id").alias("doc_id"))
               .select("doc_id"))
    t2 = t1.join(keepers, "doc_id")
    dec = decontaminate(t2, evald, n=DECON_N, threshold=DECON_THRESHOLD) \
        .select("doc_id", "contaminated")
    t3 = t2.join(dec, "doc_id").filter(~F.col("contaminated")) \
        .drop("contaminated")
    t4 = t3.filter(hash_bucket(F.col("doc_id"), "sample50")
                   < F.lit(SAMPLE_BP))

    def cnt(df, name):
        return df.groupBy("source").agg(
            F.count("*").cast("long").alias(name))

    out = cnt(train, "n_train")
    for df, name in [(t1, "n_rules"), (t2, "n_keeper"),
                     (t3, "n_clean"), (t4, "n_sampled")]:
        out = out.join(cnt(df, name), "source", "left")
    zero = F.lit(0).cast("long")
    return out.select(
        "source", "n_train",
        *[F.coalesce(c, zero).alias(c)
          for c in ["n_rules", "n_keeper", "n_clean", "n_sampled"]])


SQL_PIPELINE_FUNNEL = f"""
WITH split AS (
  SELECT doc_id,
         ('0x' || substr(md5('eval|' || CAST(doc_id AS VARCHAR)), 1, 15))
             ::BIGINT % {BP} AS b
  FROM documents
),
train AS (
  SELECT d.* FROM documents d JOIN split USING (doc_id)
  WHERE b >= {EVAL_BP}
),
evald AS (
  SELECT d.* FROM documents d JOIN split USING (doc_id) WHERE b < {EVAL_BP}
),
t1 AS (
  SELECT * FROM (
    SELECT doc_id, text, source,
           CAST(len(t) AS BIGINT) AS nw,
           CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS wc,
           CAST(len(list_filter(t, x -> regexp_full_match(x, '[a-z]+')))
                AS BIGINT) AS na,
           CAST(len(text) AS BIGINT) AS nc,
           CAST(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                AS BIGINT) AS sc
    FROM (SELECT doc_id, text, source,
                 string_split(lower(trim(text)), ' ') AS t FROM train)
  )
  WHERE nw >= 5 AND nw <= 100000
    AND CAST(wc AS DOUBLE) / CAST(nw AS DOUBLE) >= 2.0
    AND CAST(wc AS DOUBLE) / CAST(nw AS DOUBLE) <= 12.0
    AND CAST(na AS DOUBLE) / CAST(nw AS DOUBLE) >= 0.6
    AND CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) <= 0.2
),
t2 AS (
  SELECT t1.* FROM t1 JOIN (
    SELECT md5(lower(trim(text))) AS h, min(doc_id) AS doc_id
    FROM t1 GROUP BY 1
  ) k USING (doc_id)
),
toks2 AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM t2),
grams2 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                               i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))
             AS gram
  FROM toks2 WHERE len(t) >= {DECON_N}
),
tokse AS (SELECT string_split(lower(trim(text)), ' ') AS t FROM evald),
ev AS (
  SELECT DISTINCT
         unnest(list_transform(range(1, len(t) - {DECON_N - 2}),
                               i -> array_to_string(t[i:i+{DECON_N - 1}], ' ')))
             AS gram
  FROM tokse WHERE len(t) >= {DECON_N}
),
per AS (
  SELECT g.doc_id, count(*) AS n_grams, count(ev.gram) AS n_hit
  FROM grams2 g LEFT JOIN ev ON g.gram = ev.gram GROUP BY 1
),
t3 AS (
  SELECT t2.* FROM t2 LEFT JOIN per USING (doc_id)
  WHERE NOT (coalesce(n_grams, 0) > 0
             AND CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE)
                 >= {DECON_THRESHOLD})
),
t4 AS (
  SELECT t3.* FROM t3
  WHERE ('0x' || substr(md5('sample50|' || CAST(doc_id AS VARCHAR)), 1, 15))
            ::BIGINT % {BP} < {SAMPLE_BP}
)
SELECT tr.source,
       CAST(count(*) AS BIGINT) AS n_train,
       CAST(count(a.doc_id) AS BIGINT) AS n_rules,
       CAST(count(b2.doc_id) AS BIGINT) AS n_keeper,
       CAST(count(c.doc_id) AS BIGINT) AS n_clean,
       CAST(count(d.doc_id) AS BIGINT) AS n_sampled
FROM train tr
LEFT JOIN (SELECT doc_id FROM t1) a USING (doc_id)
LEFT JOIN (SELECT doc_id FROM t2) b2 USING (doc_id)
LEFT JOIN (SELECT doc_id FROM t3) c USING (doc_id)
LEFT JOIN (SELECT doc_id FROM t4) d USING (doc_id)
GROUP BY 1
"""


SCALE_QUERIES: dict[str, tuple] = {
    "decontaminate_overlap": (q_decontaminate, SQL_DECONTAMINATE),
    "decontaminate_bloom": (q_decontaminate_bloom, SQL_DECONTAMINATE_BLOOM),
    "decontaminate_bloom_fp": (q_decontaminate_bloom_fp,
                               SQL_DECONTAMINATE_BLOOM_FP),
    "dedup_neardup_bloom": (q_neardup_bloom, _sql_neardup_bloom()),
    "sketch_kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
    "sketch_hist_quantiles": (q_hist_quantiles, SQL_HIST_QUANTILES),
    "sketch_hist_by_group": (q_hist_by_group, SQL_HIST_BY_GROUP),
    "mix_weights": (q_mix_weights, SQL_MIX_WEIGHTS),
    "q_range_join_incidents": (q_range_join_incidents, SQL_RANGE_JOIN),
    "text_rules": (q_text_rules, SQL_TEXT_RULES),
    "text_classifier_score": (q_classifier_score, SQL_CLASSIFIER_SCORE),
    "text_pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "sample_domain_cap": (q_domain_cap, SQL_DOMAIN_CAP),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "q_bucketed_join": (q_bucketed_join, SQL_BUCKETED_JOIN),
    "pipeline_funnel": (q_pipeline_funnel, SQL_PIPELINE_FUNNEL),
    "ann_knn_join": (q_knn_join, SQL_KNN_JOIN),
    "ann_knn_join_ivf": (q_knn_join_ivf, SQL_KNN_JOIN_IVF),
    "ann_knn_label_accuracy": (q_knn_label_accuracy, SQL_KNN_LABEL_ACCURACY),
    "q_range_frame": (q_range_frame, SQL_RANGE_FRAME),
    "q_json_props": (q_json_props, SQL_JSON_PROPS),
    "q_unpivot": (q_unpivot, SQL_UNPIVOT),
    "q_dense_ids": (q_dense_ids, SQL_DENSE_IDS),
    "text_vocab": (q_text_vocab, SQL_TEXT_VOCAB),
    "text_bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "text_bpe_segment": (q_bpe_segment, SQL_BPE_SEGMENT),
    "text_unigram_surprisal": (q_unigram_surprisal, SQL_UNIGRAM_SURPRISAL),
}
