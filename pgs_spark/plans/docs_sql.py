"""DuckDB oracle SQL for the documents/embeddings operators.

Every expression mirrors its Spark twin in pgs_spark/functions/text.py,
operators/dedup.py and operators/similarity.py *structurally* (same operation
order), so double arithmetic and md5 hashes agree bit-for-bit across engines.
"""

from __future__ import annotations

from pgs_spark.functions.text import STOPWORDS
from pgs_spark.operators.similarity import hyperplanes

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

TOKS = r"string_split_regex(trim(text), '\s+')"

# shingle list over words w (k=3), empty when too short — mirrors text.shingles
_SHINGLES = (
    "CASE WHEN len(w) >= 3 THEN "
    "list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) "
    "ELSE [] END"
)

def doc_base(source: str = "documents") -> str:
    return f"""
docs AS MATERIALIZED (SELECT doc_id, text, {TOKS} AS w FROM {source}),
sh AS MATERIALIZED (SELECT doc_id, {_SHINGLES} AS s FROM docs)
"""


DOC_BASE = doc_base()


def token_stats_sql() -> str:
    return f"""
WITH docs AS (SELECT doc_id, text, {TOKS} AS w FROM documents)
SELECT doc_id, CAST(len(w) AS INT) AS n_tokens, CAST(length(text) AS INT) AS n_chars
FROM docs
"""


def quality_sql() -> str:
    return f"""
WITH docs AS (SELECT doc_id, text, {TOKS} AS w FROM documents),
m AS (SELECT doc_id,
    CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE) AS ar,
    CAST(len(list_filter(w, x -> x IN ({_SW}))) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS sw,
    CAST(length(regexp_replace(trim(text), '\\s', '', 'g')) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS mtl
  FROM docs)
SELECT doc_id,
    ROUND(0.4*ar + 0.4*LEAST(sw*4.0, 1.0)
          + 0.2*(CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END), 6)
        AS quality,
    CASE WHEN sw > 0.05 THEN 'en' ELSE 'unknown' END AS lang_guess
FROM m
"""


def fingerprint_sql() -> str:
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS w FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM docs),
fp AS (SELECT doc_id,
    list_filter(list_transform(s, x -> md5(x)),
                h -> substr(h, 32, 1) IN ('0','4','8','c')) AS f
  FROM sh)
SELECT doc_id, CAST(len(f) AS INT) AS n_fp, list_min(f) AS min_fp FROM fp
"""


def dedup_exact_sql() -> str:
    return """
WITH h AS (SELECT doc_id, sha256(text) AS h FROM documents),
keep AS (SELECT h, MIN(doc_id) AS keep_id FROM h GROUP BY h)
SELECT a.doc_id, k.keep_id FROM h a JOIN keep k ON a.h = k.h
"""


# Universal-hash MinHash (mirrors dedup.minhash_signature_table): one md5
# base hash per shingle, n integer multiply-add-mod permutations with the
# SAME (a_i, b_i) literals (dedup.perm_constants feeds both engines).
_MINHASH = """
shx AS MATERIALIZED (
  SELECT doc_id,
         list_transform(s, x -> ('0x' || substr(md5(x), 1, 12))::BIGINT) AS xs
  FROM sh WHERE len(s) > 0),
mh AS MATERIALIZED (
  SELECT doc_id,
         list_transform(range(0, {n_hashes}),
                        i -> list_min(list_transform(xs,
                             x -> ({a_list}[i+1] * x + {b_list}[i+1]) % {p}))) AS sig
  FROM shx),
bandix(band_idx) AS (VALUES {band_values}),
bands AS MATERIALIZED (
  SELECT doc_id AS id, CAST(band_idx AS INT) AS band_idx,
         md5(array_to_string(sig[band_idx*{band_size}+1 : band_idx*{band_size}+{band_size}], '|')) AS band_hash
  FROM mh CROSS JOIN bandix)
"""


def _minhash_ctes(n_hashes: int = 8, band_size: int = 2, source: str = "documents") -> str:
    from pgs_spark.operators.dedup import MERSENNE61, perm_constants

    n_bands = n_hashes // band_size
    band_values = ", ".join(f"({b})" for b in range(n_bands))
    consts = perm_constants(n_hashes)
    a_list = "[" + ", ".join(str(a) for a, _ in consts) + "]"
    b_list = "[" + ", ".join(str(b) for _, b in consts) + "]"
    return doc_base(source).strip() + ",\n" + _MINHASH.format(
        n_hashes=n_hashes,
        band_values=band_values,
        band_size=band_size,
        a_list=a_list,
        b_list=b_list,
        p=MERSENNE61,
    ).strip()


# Hot-bucket-capped candidate pairs — mirrors dedup.capped_bucket_pairs:
# buckets with > cap members emit a star to the bucket min instead of all
# pairs (transitively equivalent for dedup, O(m) instead of O(m²)).
_CAPPED_PAIRS = """
bsizes AS MATERIALIZED (
  SELECT band_idx, band_hash, COUNT(*) AS bsz FROM bands GROUP BY band_idx, band_hash),
cold AS (SELECT b.* FROM bands b JOIN bsizes s USING (band_idx, band_hash) WHERE s.bsz <= {cap}),
hot  AS (SELECT b.* FROM bands b JOIN bsizes s USING (band_idx, band_hash) WHERE s.bsz > {cap}),
cold_pairs AS (
  SELECT x.id AS a, y.id AS b FROM cold x JOIN cold y USING (band_idx, band_hash)
  WHERE x.id < y.id),
hot_min AS (SELECT band_idx, band_hash, MIN(id) AS a FROM hot GROUP BY band_idx, band_hash),
hot_pairs AS (
  SELECT m.a, h.id AS b FROM hot h JOIN hot_min m USING (band_idx, band_hash)
  WHERE h.id <> m.a),
pairs AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (SELECT a, b FROM cold_pairs UNION ALL SELECT a, b FROM hot_pairs))
"""


def minhash_candidates_sql(
    n_hashes: int = 8, band_size: int = 2, cap: int = 64, source: str = "documents"
) -> str:
    return f"""
WITH {_minhash_ctes(n_hashes, band_size, source)},
{_CAPPED_PAIRS.format(cap=cap).strip()}
SELECT a, b FROM pairs
"""


def minhash_hot_bucket_sql(n_clones: int = 100, cap: int = 16) -> str:
    """The deliberately-hot-bucket query: documents plus `n_clones` copies of
    doc 0's text under fresh ids — every band bucket those share blows past
    `cap`, exercising the star path end to end."""
    aug = f"""aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT 10000 + i AS doc_id,
         (SELECT text FROM documents ORDER BY doc_id LIMIT 1) AS text
  FROM range({n_clones}) t(i))"""
    return f"""
WITH {aug},
{_minhash_ctes(source="aug")},
{_CAPPED_PAIRS.format(cap=cap).strip()}
SELECT a, b FROM pairs
"""


def ngram_jaccard_sql(n_hashes: int = 8, band_size: int = 2, cap: int = 64) -> str:
    return f"""
WITH {_minhash_ctes(n_hashes, band_size)},
{_CAPPED_PAIRS.format(cap=cap).strip()},
shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS ni
  FROM pairs p JOIN shd x ON x.doc_id = p.a JOIN shd y ON y.doc_id = p.b AND y.g = x.g
  GROUP BY p.a, p.b)
SELECT p.a, p.b,
    ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
          / CAST(na.n + nb.n - COALESCE(i.ni, 0) AS DOUBLE), 6) AS jac
FROM pairs p
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
JOIN sizes na ON na.doc_id = p.a
JOIN sizes nb ON nb.doc_id = p.b
"""


def simhash64_sql(source: str = "documents") -> str:
    """Mirror of dedup.simhash64: explode tokens → md5 → per-bit votes →
    64 sums per doc → majority bits → 16 hex chars."""
    digit_cols = ", ".join(
        f"(strpos('0123456789abcdef', substr(h, {d + 1}, 1)) - 1) AS d{d}"
        for d in range(16)
    )
    sum_cols = ", ".join(
        f"SUM((d{j // 4} >> {j % 4}) & 1) AS s{j}" for j in range(64)
    )
    hex_digits = " || ".join(
        "substr('0123456789abcdef', ("
        + " + ".join(
            f"(CASE WHEN 2*s{4 * d + r} > n THEN {1 << r} ELSE 0 END)"
            for r in range(4)
        )
        + ") + 1, 1)"
        for d in range(16)
    )
    return f"""tok AS MATERIALIZED (
  SELECT doc_id AS id, md5(unnest(w)) AS h
  FROM (SELECT doc_id, {TOKS} AS w FROM {source}) d),
dig AS (SELECT id, {digit_cols} FROM tok),
sh64 AS MATERIALIZED (SELECT id, {sum_cols}, COUNT(*) AS n FROM dig GROUP BY id),
sim AS MATERIALIZED (SELECT id, {hex_digits} AS simhash FROM sh64)"""


def simhash_query_sql() -> str:
    return f"WITH {simhash64_sql()}\nSELECT id, simhash FROM sim"


def simhash_candidates_sql(n_bands: int = 4, cap: int = 64) -> str:
    """Hamming-banded near-dup candidates over simhash64 with the same
    hot-bucket star capping as MinHash LSH."""
    width = 16 // n_bands
    band_values = ", ".join(f"({b})" for b in range(n_bands))
    return f"""
WITH {simhash64_sql()},
bandix(band_idx) AS (VALUES {band_values}),
bands AS MATERIALIZED (
  SELECT id, CAST(band_idx AS INT) AS band_idx,
         substr(simhash, band_idx*{width} + 1, {width}) AS band_hash
  FROM sim CROSS JOIN bandix),
{_CAPPED_PAIRS.format(cap=cap).strip()}
SELECT a, b FROM pairs
"""


def simhash_sql() -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    terms = " + ".join(
        f"(CASE WHEN 2*len(list_filter(hs, h -> substr(h, {j + 1}, 1) IN {odd})) > len(hs) "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS w FROM documents),
hx AS (SELECT doc_id, list_transform(w, t -> md5(t)) AS hs FROM docs)
SELECT doc_id AS id, CAST({terms} AS INT) AS simhash FROM hx
"""


def ann_cosine_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id < {n_queries}),
b AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv FROM embeddings),
scored AS (
  SELECT q.query_id, b.neighbor_id, ROUND(list_dot_product(qv, nv), 6) AS sim
  FROM b CROSS JOIN q WHERE q.query_id <> b.neighbor_id)
SELECT query_id, neighbor_id, sim, rnk FROM (
  SELECT query_id, neighbor_id, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rnk
  FROM scored) t
WHERE rnk <= {k}
"""


def _lsh_bucket_terms(
    vec_expr: str, n_planes: int = 8, dim: int = 64, seed: int = 42
) -> str:
    """Random-hyperplane bucket id as a SQL expression over `vec_expr` —
    the identical ±1 md5-parity planes operators/similarity.lsh_buckets
    inlines, so both engines bucket bit-identically."""
    planes = hyperplanes(n_planes, dim, seed)
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, ["
        + ", ".join(f"{float(x)!r}" for x in p)
        + f"]) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def lsh_buckets_sql(n_planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    terms = _lsh_bucket_terms("embedding::DOUBLE[]", n_planes, dim, seed)
    return f"""
SELECT vec_id AS id, CAST({terms} AS INT) AS bucket FROM embeddings
"""


def embedding_neardup_sql(
    tau: float = 0.99,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    cap: int = 256,
) -> str:
    """Embedding-cosine near-dup keep-list oracle (mirrors
    operators/similarity.embedding_neardup over the augmented corpus built
    by __spark_entry__.q_embedding_neardup).

    The raw synthetic embeddings contain NO near-dups (max pairwise cosine
    0.51 at sf0.01), so the query deterministically augments them — the
    minhash_hot_bucket convention: exact clones (ids+100000, cosine 1.0),
    0.95/0.05 blends with the next vector (ids+200000, cosine ≈ 0.9986 —
    above tau) and 0.70/0.30 blends (ids+300000, cosine ≈ 0.92 — below
    tau, exercising the threshold for real). Bucketing, star capping,
    6dp-rounded cosine threshold, and the recursive-CTE closure replay the
    Spark plan term for term, so the match is exact including any LSH
    recall loss."""
    terms = _lsh_bucket_terms("v", n_planes, dim, seed)
    return f"""
WITH RECURSIVE
base AS MATERIALIZED (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
mixa AS (
  SELECT 200000 + a.id AS id,
         list_transform(list_zip(a.v, b.v), p -> 0.95*p[1] + 0.05*p[2]) AS m
  FROM base a JOIN base b ON b.id = a.id + 1 WHERE a.id % 20 = 10),
mixb AS (
  SELECT 300000 + a.id AS id,
         list_transform(list_zip(a.v, b.v), p -> 0.7*p[1] + 0.3*p[2]) AS m
  FROM base a JOIN base b ON b.id = a.id + 1 WHERE a.id % 20 = 5),
aug AS MATERIALIZED (
  SELECT id, v FROM base
  UNION ALL SELECT 100000 + id, v FROM base WHERE id % 20 = 0
  UNION ALL SELECT id, list_transform(m, x -> x / sqrt(list_dot_product(m, m))) FROM mixa
  UNION ALL SELECT id, list_transform(m, x -> x / sqrt(list_dot_product(m, m))) FROM mixb),
bands AS MATERIALIZED (
  SELECT id, 0 AS band_idx, CAST({terms} AS INT) AS band_hash FROM aug),
{_CAPPED_PAIRS.format(cap=cap).strip()},
verified AS MATERIALIZED (
  SELECT p.a, p.b FROM pairs p
  JOIN aug x ON x.id = p.a JOIN aug y ON y.id = p.b
  WHERE ROUND(list_dot_product(x.v, y.v), 6) >= {tau!r}),
csym AS MATERIALIZED (
  SELECT a AS u, b AS w FROM verified UNION ALL SELECT b, a FROM verified),
reach(id, r) AS (
    SELECT id, id FROM aug
    UNION
    SELECT s.u, reach.r FROM csym s JOIN reach ON s.w = reach.id)
SELECT id AS vec_id, MIN(r) AS keep_id FROM reach GROUP BY id
"""


def dedup_clusters_parts(
    jaccard: float = 0.8, n_hashes: int = 8, band_size: int = 2, cap: int = 64
) -> tuple[str, str]:
    """(CTE block, final keep-list SELECT) — composable (corpus_clean_sql
    builds on the same chain). See dedup_clusters_sql for semantics."""
    ctes = f"""
{_minhash_ctes(n_hashes, band_size)},
{_CAPPED_PAIRS.format(cap=cap).strip()},
shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS ni
  FROM pairs p JOIN shd x ON x.doc_id = p.a JOIN shd y ON y.doc_id = p.b AND y.g = x.g
  GROUP BY p.a, p.b),
verified AS MATERIALIZED (
  SELECT p.a, p.b FROM pairs p
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
  JOIN sizes na ON na.doc_id = p.a
  JOIN sizes nb ON nb.doc_id = p.b
  WHERE ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
              / CAST(na.n + nb.n - COALESCE(i.ni, 0) AS DOUBLE), 6) >= {jaccard!r}),
eh AS MATERIALIZED (SELECT doc_id, sha256(text) AS hh FROM documents),
ekeep AS (SELECT hh, MIN(doc_id) AS keep_id FROM eh GROUP BY hh),
exact_edges AS (
  SELECT k.keep_id AS a, x.doc_id AS b FROM eh x JOIN ekeep k ON x.hh = k.hh
  WHERE x.doc_id <> k.keep_id),
pe AS MATERIALIZED (SELECT a, b FROM verified UNION ALL SELECT a, b FROM exact_edges),
csym AS MATERIALIZED (SELECT a AS u, b AS v FROM pe UNION ALL SELECT b, a FROM pe),
reach(id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT s.u, reach.r FROM csym s JOIN reach ON s.v = reach.id)"""
    final = "SELECT id AS doc_id, MIN(r) AS keep_id FROM reach GROUP BY id"
    return ctes, final


def dedup_clusters_sql(
    jaccard: float = 0.8, n_hashes: int = 8, band_size: int = 2, cap: int = 64
) -> str:
    """End-to-end keep-list oracle: LSH candidates → exact Jaccard filter →
    ∪ exact sha256-duplicate edges → transitive closure (recursive CTE) →
    min doc id per cluster. Mirrors operators/dedup.dedup_keep_list."""
    ctes, final = dedup_clusters_parts(jaccard, n_hashes, band_size, cap)
    return f"WITH RECURSIVE {ctes}\n{final}"


def corpus_clean_sql(min_quality: float = 0.5) -> str:
    """END-TO-END corpus pipeline oracle: dedup keep-list → keepers only →
    per-doc quality (6dp-rounded, so the >= filter is cross-engine exact) →
    per-language corpus stats. Mirrors __spark_entry__.q_corpus_clean."""
    ctes, final = dedup_clusters_parts()
    return f"""
WITH RECURSIVE {ctes},
clusters AS MATERIALIZED ({final}),
keepers AS (SELECT doc_id FROM clusters WHERE doc_id = keep_id),
kd AS MATERIALIZED (
    SELECT d.doc_id, d.lang, d.text, {TOKS} AS w
    FROM documents d JOIN keepers USING (doc_id)),
m AS (SELECT doc_id, lang, len(w) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE) AS ar,
    CAST(len(list_filter(w, x -> x IN ({_SW}))) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS sw,
    CAST(length(regexp_replace(trim(text), '\\s', '', 'g')) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS mtl
  FROM kd),
q AS (SELECT doc_id, lang, n_tokens,
    ROUND(0.4*ar + 0.4*LEAST(sw*4.0, 1.0)
          + 0.2*(CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END), 6)
        AS quality
  FROM m)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(quality), 6) AS avg_quality_r
FROM q WHERE quality >= {min_quality!r} GROUP BY lang
"""


def repetition_stats_sql() -> str:
    """Gopher-style repetition metrics oracle (mirrors
    __spark_entry__.q_repetition_stats): top-bigram fraction (share of the
    doc's bigrams taken by its most frequent bigram) and duplicate-trigram
    fraction (1 − distinct/total trigrams), 6dp-rounded."""
    return r"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
bi AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 2 THEN
    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
    ELSE [] END) AS g FROM docs),
tri AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN
    list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
    ELSE [] END) AS g FROM docs),
bstat AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bi
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id),
tstat AS (
  SELECT doc_id, COUNT(*) AS d_tri, SUM(c) AS n_tri
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY doc_id, g)
  GROUP BY doc_id)
SELECT b.doc_id,
       ROUND(CAST(top_c AS DOUBLE) / CAST(n_bi AS DOUBLE), 6) AS top_bigram_frac,
       ROUND(1.0 - CAST(d_tri AS DOUBLE) / CAST(n_tri AS DOUBLE), 6) AS dup_trigram_frac
FROM bstat b JOIN tstat t USING (doc_id)
"""


PII_EMAIL = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PII_PHONE = "[0-9]{3}-[0-9]{4}"


def pii_scrub_sql() -> str:
    """PII scrub oracle (mirrors __spark_entry__.q_pii_scrub): the query
    deterministically plants emails (doc_id % 7 == 0) and phone numbers
    (doc_id % 11 == 3) — the synthetic corpus contains none — then counts
    matches and measures the scrubbed text. Patterns are the RE2∩Java-regex
    common subset, so both engines match identically; DuckDB needs the 'g'
    flag to mirror Spark's replace-all."""
    return f"""
WITH aug AS MATERIALIZED (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 3 THEN ' call 555-0142 soon' ELSE '' END
         AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(length(regexp_replace(regexp_replace(t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                                  '{PII_PHONE}', '[PHONE]', 'g')) AS BIGINT)
         AS scrubbed_len
FROM aug
"""


def stream_dedup_sql() -> str:
    """Batch twin of streaming/windows.streaming_dedup_keep: the streaming
    min-per-content-hash state after draining all input equals the batch
    group-by exactly (min is arrival-order-insensitive)."""
    return """
SELECT sha256(text) AS hh, MIN(doc_id) AS keep_id FROM documents GROUP BY hh
"""

def _kshingle_expr(k: int) -> str:
    """k-word shingle list over token array w — the docs_sql mirror of
    text.shingles_from_tokens for arbitrary k (joins with single spaces,
    empty when the doc is shorter than k words)."""
    concat = " || ' ' || ".join(f"w[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len(w) >= {k} THEN "
        f"list_transform(range(1, len(w) - {k - 2}), i -> {concat}) "
        "ELSE [] END"
    )


def lm_score_sql() -> str:
    """Corpus bigram-LM quality score oracle (mirrors
    __spark_entry__.q_lm_score): per-doc average ln p(w2|w1) under the
    corpus-wide MLE bigram model, p = c(w1 w2) / c(w1 ·), where c(w1 ·)
    counts bigram INSTANCES starting with w1 — so every probability is a
    ratio of exact integers and ln() is the only libm call (1-ulp
    cross-engine divergence, buried by the 6dp round after the average)."""
    return f"""
WITH docs AS MATERIALIZED (SELECT doc_id, {TOKS} AS w FROM documents),
bi AS MATERIALIZED (
  SELECT doc_id, g, split_part(g, ' ', 1) AS w1
  FROM (SELECT doc_id, unnest({_kshingle_expr(2)}) AS g FROM docs)),
cg AS MATERIALIZED (SELECT g, COUNT(*) AS cg FROM bi GROUP BY g),
cw AS MATERIALIZED (SELECT w1, COUNT(*) AS cw FROM bi GROUP BY w1)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(AVG(ln(CAST(cg.cg AS DOUBLE) / CAST(cw.cw AS DOUBLE))), 6) AS avg_logp
FROM bi JOIN cg USING (g) JOIN cw USING (w1)
GROUP BY doc_id
"""


def ngram_novelty_sql(k: int = 5) -> str:
    """Cross-document n-gram novelty oracle (mirrors
    __spark_entry__.q_ngram_novelty): for each doc, the fraction of its
    DISTINCT k-shingles that occur in at least one OTHER document
    (document frequency ≥ 2) — the RefinedWeb/Dolma-style duplication
    signal one step below full near-dup clustering. Exact integer ratio,
    single division, 6dp round is cross-engine safe."""
    return f"""
WITH docs AS MATERIALIZED (SELECT doc_id, {TOKS} AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_kshingle_expr(k)}) AS g FROM docs)),
df AS MATERIALIZED (SELECT g, COUNT(*) AS df FROM sh GROUP BY g)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       ROUND(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
FROM sh JOIN df USING (g)
GROUP BY doc_id
"""


def pack_chunks_sql(capacity: int = 2048, n_shards: int = 8) -> str:
    """Concat-and-chunk sequence-packing oracle (mirrors
    operators/packing.pack_chunks): identical md5 shard key, identical
    (hash, doc_id) within-shard order, identical running-total window —
    all-integer arithmetic, so the match is exact, not rounded."""
    stride = 1 << 40
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|p42'), 1, 4))::BIGINT
              % {n_shards} AS INT) AS shard,
         md5(CAST(doc_id AS VARCHAR) || '|p42') AS h,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents WHERE length(trim(text)) > 0),
spans AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM base)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_off,
       CAST(shard AS BIGINT) * {stride}
           + CAST(FLOOR((cum - n_tokens) / {capacity}) AS BIGINT) AS first_chunk,
       CAST(shard AS BIGINT) * {stride}
           + CAST(FLOOR((cum - 1) / {capacity}) AS BIGINT) AS last_chunk
FROM spans
"""


def decontaminate_sql(k: int = 5, eval_mod: int = 41, threshold: int = 1) -> str:
    """Benchmark-decontamination oracle (mirrors
    operators/corpus.decontaminate): eval slice doc_id % eval_mod == 0,
    distinct-k-gram hit counting against it, exact integers throughout."""
    return f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, {TOKS} AS w FROM documents),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_kshingle_expr(k)}) AS g FROM docs)),
ev AS MATERIALIZED (
  SELECT DISTINCT g FROM sh WHERE doc_id % {eval_mod} = 0)
SELECT s.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       CASE WHEN SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) >= {threshold}
            THEN 1 ELSE 0 END AS contaminated
FROM sh s LEFT JOIN ev ON s.g = ev.g
WHERE s.doc_id % {eval_mod} <> 0
GROUP BY s.doc_id
"""


def stratified_sample_sql(seed: int = 42) -> str:
    """Domain-mix rebalancing oracle (mirrors corpus.stratified_sample,
    uniform target): per-stratum census -> rate = min(1, (N/|S|)/n_s) ->
    deterministic md5 unit-uniform keep decision -> per-stratum report.
    The u < rate comparison uses doubles built from identical expression
    trees on both engines, so every keep decision replays exactly."""
    return f"""
WITH cnt AS MATERIALIZED (
    SELECT lang AS stratum, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
               CAST(COUNT(*) AS DOUBLE) AS n_strata FROM cnt),
rates AS MATERIALIZED (
    SELECT stratum, n_docs,
           LEAST(1.0, (tot.n_total / tot.n_strata) / CAST(n_docs AS DOUBLE)) AS rate
    FROM cnt CROSS JOIN tot),
kept AS (
    SELECT d.lang AS stratum, COUNT(*) AS n_kept
    FROM documents d JOIN rates r ON d.lang = r.stratum
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|mix{seed}'), 1, 6))::BIGINT
          / 16777216.0 < r.rate
    GROUP BY d.lang)
SELECT r.stratum, r.n_docs, COALESCE(k.n_kept, 0) AS n_kept,
       ROUND(r.rate, 6) AS rate_r
FROM rates r LEFT JOIN kept k ON r.stratum = k.stratum
"""


def span_dedup_sql(k: int = 5) -> str:
    """Duplicated-span coverage oracle (mirrors corpus.span_dedup): every
    span POSITION counts, duplication = document frequency >= 2 via
    COUNT(DISTINCT doc). Exact integer ratio, single division."""
    return f"""
WITH docs AS MATERIALIZED (SELECT doc_id, {TOKS} AS w FROM documents),
sh AS MATERIALIZED (
    SELECT doc_id, unnest({_kshingle_expr(k)}) AS g FROM docs),
df AS MATERIALIZED (
    SELECT g, COUNT(*) AS nd FROM (SELECT DISTINCT doc_id, g FROM sh) GROUP BY g)
SELECT doc_id,
       COUNT(*) AS n_spans,
       SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup_spans,
       ROUND(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio_r
FROM sh JOIN df USING (g)
GROUP BY doc_id
"""


def dsir_weights_sql(n_buckets: int = 256, target_mod: int = 7) -> str:
    """DSIR importance-weight oracle (mirrors corpus.dsir_weights): hashed
    unigram buckets, Laplace-smoothed target/raw log-likelihood ratio,
    per-raw-doc weight = sum over bucket counts. ln() is the only libm
    call; the per-doc sum spans <= n_buckets terms so the 6dp round buries
    summation-order ulp drift (the lm_score argument)."""
    return f"""
WITH tok AS MATERIALIZED (
    SELECT doc_id,
           ('0x' || substr(md5(w), 1, 6))::BIGINT % {n_buckets} AS b
    FROM (SELECT doc_id, unnest({TOKS}) AS w FROM documents)),
tgt AS MATERIALIZED (SELECT b FROM tok WHERE doc_id % {target_mod} = 0),
raw AS MATERIALIZED (SELECT doc_id, b FROM tok WHERE doc_id % {target_mod} <> 0),
ct AS (SELECT b, COUNT(*) AS ct FROM tgt GROUP BY b),
cr AS (SELECT b, COUNT(*) AS cr FROM raw GROUP BY b),
ctt AS (SELECT COUNT(*) AS ct_total FROM tgt),
crt AS (SELECT COUNT(*) AS cr_total FROM raw),
lam AS MATERIALIZED (
    SELECT cr.b,
           ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
              / CAST(ctt.ct_total + {n_buckets} AS DOUBLE))
           - ln(CAST(cr.cr + 1 AS DOUBLE)
                / CAST(crt.cr_total + {n_buckets} AS DOUBLE)) AS lam
    FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN ctt CROSS JOIN crt),
n_db AS (SELECT doc_id, b, COUNT(*) AS n_db FROM raw GROUP BY doc_id, b)
SELECT n.doc_id,
       SUM(n.n_db) AS n_tokens,
       ROUND(SUM(CAST(n.n_db AS DOUBLE) * l.lam), 6) AS weight_r
FROM n_db n JOIN lam l ON n.b = l.b
GROUP BY n.doc_id
"""


def tfidf_top_terms_sql(top_k: int = 3) -> str:
    """tf·idf top-terms oracle (mirrors corpus.tfidf_top_terms): exact
    integer tf/df, one ln + one multiply, rank window ordered
    (tfidf DESC, term ASC). Identical expression trees -> identical doubles
    -> identical tie-breaks."""
    return f"""
WITH tok AS MATERIALIZED (
    SELECT doc_id, unnest({TOKS}) AS term FROM documents),
tf AS MATERIALIZED (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dft AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term,
           CAST(tf.tf AS DOUBLE) * ln(nn.n_docs / CAST(dft.df AS DOUBLE)) AS tfidf
    FROM tf JOIN dft USING (term) CROSS JOIN nn),
ranked AS (
    SELECT doc_id, term, tfidf,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, term) AS term_rank
    FROM scored)
SELECT doc_id, term, term_rank, ROUND(tfidf, 6) AS tfidf_r
FROM ranked WHERE term_rank <= {top_k}
"""


def quality_census_sql() -> str:
    """Per-language corpus census oracle (mirrors
    streaming/windows.streaming_quality_census AND its batch twin): integer
    aggregates over the 6dp-rounded quality flag — order-insensitive, so
    the streaming availableNow drain equals this batch GROUP BY exactly."""
    return f"""
WITH docs AS (SELECT lang, text, {TOKS} AS w FROM documents),
m AS (SELECT lang, CAST(len(w) AS INT) AS n_tok,
    CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE) AS ar,
    CAST(len(list_filter(w, x -> x IN ({_SW}))) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS sw,
    CAST(length(regexp_replace(trim(text), '\\s', '', 'g')) AS DOUBLE)
        / CAST(len(w) AS DOUBLE) AS mtl
  FROM docs),
q AS (SELECT lang, n_tok,
    ROUND(0.4*ar + 0.4*LEAST(sw*4.0, 1.0)
          + 0.2*(CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END), 6)
        AS quality
  FROM m)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high_quality
FROM q GROUP BY lang
"""


def cms_token_counts_sql(depth: int = 4, width: int = 64, top_k: int = 20) -> str:
    """Count-min-sketch oracle (mirrors corpus.cms_token_counts):
    deterministic md5(row|token) bucket rows replayed exactly; true top-k
    tokens joined against the depth×width sketch, estimate = MIN over rows.
    All integers — cross-engine exact."""
    return f"""
WITH tok AS MATERIALIZED (
    SELECT unnest({TOKS}) AS term FROM documents),
rows_ AS (SELECT unnest(range(0, {depth})) AS r),
buckets AS MATERIALIZED (
    SELECT r,
           ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || term), 1, 6))::BIGINT
               % {width} AS b
    FROM tok CROSS JOIN rows_),
sketch AS MATERIALIZED (SELECT r, b, COUNT(*) AS c FROM buckets GROUP BY r, b),
truth AS (SELECT term, COUNT(*) AS true_count FROM tok GROUP BY term),
top AS (
    SELECT term, true_count FROM (
        SELECT term, true_count,
               ROW_NUMBER() OVER (ORDER BY true_count DESC, term) AS rk
        FROM truth) WHERE rk <= {top_k}),
probes AS (
    SELECT t.term, t.true_count, r.r,
           ('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' || t.term), 1, 6))::BIGINT
               % {width} AS b
    FROM top t CROSS JOIN rows_ r)
SELECT p.term, p.true_count, MIN(s.c) AS cms_estimate
FROM probes p JOIN sketch s ON p.r = s.r AND p.b = s.b
GROUP BY p.term, p.true_count
"""


def cms_sketch_cells_sql(depth: int = 4, width: int = 64) -> str:
    """Raw count-min sketch cells oracle (mirrors
    streaming/windows.streaming_cms_sketch AND the batch sketch build in
    corpus.cms_token_counts): the depth×width integer cell counts."""
    return f"""
WITH tok AS MATERIALIZED (
    SELECT unnest({TOKS}) AS term FROM documents),
rows_ AS (SELECT unnest(range(0, {depth})) AS r)
SELECT CAST(r AS INT) AS r,
       ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || term), 1, 6))::BIGINT
           % {width} AS b,
       COUNT(*) AS c
FROM tok CROSS JOIN rows_
GROUP BY 1, 2
"""


def funnel_sql(stages: tuple[str, str, str] = ("view", "click", "purchase")) -> str:
    """Ordered-funnel oracle (mirrors corpus.funnel_counts): per-stage min
    timestamps joined forward with strict > — integer user counts."""
    s1, s2, s3 = stages
    return f"""
WITH st1 AS MATERIALIZED (
    SELECT user_id AS u, MIN(ts) AS t1 FROM events
    WHERE event_type = '{s1}' GROUP BY user_id),
st2 AS MATERIALIZED (
    SELECT e.user_id AS u, MIN(e.ts) AS t2 FROM events e JOIN st1 ON e.user_id = st1.u
    WHERE e.event_type = '{s2}' AND e.ts > st1.t1 GROUP BY e.user_id),
st3 AS MATERIALIZED (
    SELECT e.user_id AS u, MIN(e.ts) AS t3 FROM events e JOIN st2 ON e.user_id = st2.u
    WHERE e.event_type = '{s3}' AND e.ts > st2.t2 GROUP BY e.user_id)
SELECT CAST(1 AS INT) AS stage_idx, '{s1}' AS stage, (SELECT COUNT(*) FROM st1) AS n_users
UNION ALL
SELECT CAST(2 AS INT), '{s2}', (SELECT COUNT(*) FROM st2)
UNION ALL
SELECT CAST(3 AS INT), '{s3}', (SELECT COUNT(*) FROM st3)
"""


def hll_distinct_tokens_sql(group_col: str = "lang") -> str:
    """Per-group HLL distinct-token oracle (mirrors
    corpus.hll_distinct_tokens): the hyperball register construction over
    md5(token), grouped — dyadic-exact estimate, integer token counts."""
    est = (
        "0.673 * 256.0 / (CAST(16 - COUNT(*) AS DOUBLE)"
        " + SUM(1.0 / CAST(1 << rho AS DOUBLE)))"
    )
    return f"""
WITH tok AS MATERIALIZED (
    SELECT {group_col} AS grp,
           ('0x' || substr(md5(w), 1, 1))::INT AS j,
           CASE WHEN w16 = 0 THEN 17 ELSE 17 - length(bin(w16)) END AS rho
    FROM (SELECT {group_col}, w,
                 ('0x' || substr(md5(w), 2, 4))::INT AS w16
          FROM (SELECT {group_col}, unnest({TOKS}) AS w FROM documents))),
counts AS (SELECT grp, COUNT(*) AS n_tokens FROM tok GROUP BY grp),
regs AS (SELECT grp, j, MAX(rho) AS rho FROM tok GROUP BY grp, j),
ests AS (SELECT grp, ROUND({est}, 6) AS distinct_est_r FROM regs GROUP BY grp)
SELECT c.grp AS {group_col}, c.n_tokens, e.distinct_est_r
FROM counts c JOIN ests e ON c.grp = e.grp
"""


def gopher_rules_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_distinct: int = 2,
) -> str:
    """Gopher document-quality rules oracle (mirrors
    operators/corpus.gopher_rules): exact-integer rule inputs, two single
    divisions rounded to 6dp, thresholds graded on the ROUNDED values —
    bit-exact against Spark."""
    return f"""
WITH d AS MATERIALIZED (SELECT doc_id, {TOKS} AS w FROM documents),
s AS (
  SELECT doc_id,
         len(w) AS n_words,
         list_sum(list_transform(w, x -> length(x))) AS total_chars,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_intersect(w, [{_SW}])) AS n_stop_distinct
  FROM d),
g AS (
  SELECT doc_id,
         CAST(n_words AS INT) AS n_words,
         ROUND(CAST(total_chars AS DOUBLE) / n_words, 6) AS mean_wlen_r,
         ROUND(CAST(n_alpha AS DOUBLE) / n_words, 6) AS alpha_word_frac_r,
         CAST(n_stop_distinct AS INT) AS n_stop_distinct
  FROM s)
SELECT doc_id, n_words, mean_wlen_r, alpha_word_frac_r, n_stop_distinct,
       (CASE WHEN n_words < {min_words} OR n_words > {max_words} THEN 1 ELSE 0 END
      + CASE WHEN mean_wlen_r < {min_mean_wlen} OR mean_wlen_r > {max_mean_wlen} THEN 1 ELSE 0 END
      + CASE WHEN alpha_word_frac_r < {min_alpha_frac} THEN 1 ELSE 0 END
      + CASE WHEN n_stop_distinct < {min_stop_distinct} THEN 1 ELSE 0 END)
         AS n_rules_failed,
       CASE WHEN (n_words >= {min_words} AND n_words <= {max_words}
             AND mean_wlen_r >= {min_mean_wlen} AND mean_wlen_r <= {max_mean_wlen}
             AND alpha_word_frac_r >= {min_alpha_frac}
             AND n_stop_distinct >= {min_stop_distinct}) THEN 1 ELSE 0 END AS passes
FROM g
"""


# Planted multi-line structure for the C4 gate query (the synthetic corpus
# is single-line by construction — same augmentation discipline as
# pii_scrub). Mirrored EXACTLY by __spark_entry__.q_c4_line_filter.
def c4_augmented_text_sql() -> str:
    return (
        "text"
        " || chr(10) || 'this planted line has plenty of words and ends well '"
        " || CAST(doc_id % 7 AS VARCHAR) || '.'"
        " || chr(10) || 'tiny line.'"
        " || chr(10) || 'this { braced line would otherwise be kept just fine.'"
        " || chr(10) || 'this javascript line would otherwise be kept just fine.'"
        " || chr(10) || 'another planted sentence with enough words number '"
        " || CAST(doc_id % 5 AS VARCHAR) || '!'"
        " || CASE WHEN doc_id % 3 = 0 THEN chr(10)"
        " || 'a third good line appears sometimes for doc '"
        " || CAST(doc_id AS VARCHAR) || '?' ELSE '' END"
    )


def c4_line_stats_sql(min_line_words: int = 5, min_kept_lines: int = 3) -> str:
    """C4 line-cleaning oracle (mirrors operators/corpus.c4_line_stats over
    the planted multi-line text): all-string predicates + integer counts —
    no floats, bit-exact. A line is kept iff the RTRIMMED line ends in
    [.!?], has >= min_line_words whitespace words, and contains neither a
    curly brace nor 'javascript' (case-insensitive)."""
    kept = (
        "list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?]$')"
        f" AND len(string_split_regex(trim(l), '\\s+')) >= {min_line_words}"
        " AND NOT contains(lower(l), '{')"
        " AND NOT contains(lower(l), 'javascript'))"
    )
    return f"""
WITH aug AS MATERIALIZED (
  SELECT doc_id, {c4_augmented_text_sql()} AS t FROM documents),
sp AS (
  SELECT doc_id, string_split(t, chr(10)) AS lines FROM aug),
k AS (
  SELECT doc_id, len(lines) AS n_lines, {kept} AS kept FROM sp)
SELECT doc_id,
       CAST(n_lines AS INT) AS n_lines,
       CAST(len(kept) AS INT) AS n_kept,
       CAST(COALESCE(list_sum(list_transform(kept,
            l -> len(string_split_regex(trim(l), '\\s+')))), 0) AS INT)
         AS kept_words,
       CASE WHEN len(kept) >= {min_kept_lines} THEN 1 ELSE 0 END AS doc_pass
FROM k
"""


def vocab_coverage_sql(vocab_size: int = 64) -> str:
    """Oracle for corpus.vocab_coverage: identical top-V vocabulary cut
    (COUNT DESC, term ASC — a total order, so LIMIT is deterministic) and
    the same integer floor-divided OOV fraction."""
    return f"""
WITH docs AS (SELECT doc_id, {TOKS} AS w FROM documents),
tok AS MATERIALIZED (SELECT doc_id, unnest(w) AS term FROM docs),
cnt AS (SELECT term, COUNT(*) AS c FROM tok GROUP BY term),
vocab AS (SELECT term, 1 AS iv FROM cnt ORDER BY c DESC, term ASC LIMIT {vocab_size}),
perdoc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN v.iv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM tok t LEFT JOIN vocab v ON t.term = v.term
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_micro
FROM perdoc
"""


def event_transitions_sql() -> str:
    """Oracle for corpus.event_transitions: LEAD over the identical
    (ts, event_id) total order per user, exact counts, one floor division."""
    return """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (SELECT from_type, SUM(n_transitions) AS from_total
        FROM pairs GROUP BY from_type)
SELECT p.from_type, p.to_type,
       CAST(p.n_transitions AS BIGINT) AS n_transitions,
       CAST(p.n_transitions * 1000000 // t.from_total AS BIGINT) AS prob_micro
FROM pairs p JOIN tot t ON p.from_type = t.from_type
"""


def retention_sql() -> str:
    """Oracle for corpus.retention_cohorts: identical day truncation,
    per-user MIN cohort, (user, day) DISTINCT, floor-divided micro
    retention."""
    return """
WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT u, MIN(day) AS cohort FROM days GROUP BY u),
sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM first GROUP BY cohort),
cells AS (
  SELECT f.cohort, CAST(d.day - f.cohort AS INT) AS age_days,
         COUNT(*) AS n_users
  FROM days d JOIN first f ON d.u = f.u
  GROUP BY f.cohort, age_days
)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day, c.age_days,
       CAST(c.n_users AS BIGINT) AS n_users,
       CAST(c.n_users * 1000000 // s.cohort_size AS BIGINT) AS retention_micro
FROM cells c JOIN sizes s ON c.cohort = s.cohort
"""
