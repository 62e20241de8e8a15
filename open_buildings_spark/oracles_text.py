"""DuckDB oracle SQL for the training-data pipeline operators (dedup,
similarity search, text analysis, multimodal decode, events). Independent
reimplementations in ANSI SQL; md5-based hashing guarantees bit parity with
the Spark engine's built-in md5/conv expressions.
"""

from __future__ import annotations

from . import datagen
from .operators.dedup import NEAR_DUP_OFFSET, corpus_sql_cte
from .operators.similarity import DIM, EMB_DUP_OFFSET, N_BANDS, N_PLANES
from .operators.textstats import LANG_MARKERS, PII_PATTERNS, STOPWORDS

MINHASH_K = 8
MINHASH_BANDS = 4
JACCARD_THRESHOLD = 0.35
SIMHASH_BITS = 32

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _hex_bigint(expr: str) -> str:
    return f"('0x' || {expr})::BIGINT"


def oracle_sql_text() -> dict[str, str]:
    corpus = corpus_sql_cte()
    sqls: dict[str, str] = {}

    sqls["t_exact_dedup"] = f"""
WITH {corpus}
SELECT doc_id, md5(text) AS fingerprint,
       MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
FROM corpus
"""

    # streaming dedup-on-ingest drains to exactly the batch groupBy state
    sqls["t_stream_dedup"] = f"""
WITH {corpus}
SELECT md5(text) AS fingerprint, MIN(doc_id) AS canonical_id,
       COUNT(*) AS group_size
FROM corpus GROUP BY 1
"""

    mh_cols = ", ".join(
        f"MIN(md5('{i}|' || shingle)) AS mh_{i}" for i in range(MINHASH_K)
    )
    band_cases = " ".join(
        f"WHEN {b} THEN md5(mh_{2 * b} || mh_{2 * b + 1})" for b in range(MINHASH_BANDS)
    )
    # shared CTE chain: corpus -> shingles -> minhash -> LSH pairs -> exact
    # Jaccard (used by t_minhash_lsh and t_neardup_clusters)
    minhash_ctes = f"""
toks AS (SELECT doc_id, {_TOKS} AS tk FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(tk[CAST(u.i AS INT):CAST(u.i + 2 AS INT)], ' ') AS shingle
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - 1, 1))) AS i) u
  WHERE len(tk) >= 3
),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, b.band, CASE b.band {band_cases} END AS bkey
  FROM sig, (SELECT unnest(range(0, {MINHASH_BANDS})) AS band) b
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r ON l.bkey = r.bkey AND l.band = r.band AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS i
  FROM pairs p JOIN sh sa ON sa.doc_id = p.a
  JOIN sh sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
  GROUP BY p.a, p.b
),
jacs AS (
  SELECT i.a, i.b,
         CAST(i.i AS DOUBLE) / CAST(na.n + nb.n - i.i AS DOUBLE) AS jac
  FROM inter i JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
)
""".strip()

    sqls["t_minhash_lsh"] = f"""
WITH {corpus},
{minhash_ctes}
SELECT a, b, jac FROM jacs WHERE jac >= {JACCARD_THRESHOLD}
"""

    # connected components over the verified near-dup pair graph: transitive
    # closure via a recursive CTE (fixture graphs are tiny), min reachable
    # id per node, singletons keep themselves with cluster_size 1
    sqls["t_neardup_clusters"] = f"""
WITH RECURSIVE {corpus},
{minhash_ctes},
good AS (SELECT a, b FROM jacs WHERE jac >= {JACCARD_THRESHOLD}),
edges AS (
  SELECT a AS src, b AS dst FROM good
  UNION
  SELECT b AS src, a AS dst FROM good
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
canon AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id),
csz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM canon GROUP BY canonical_id)
SELECT c.id AS doc_id, c.canonical_id, s.cluster_size
FROM canon c JOIN csz s USING (canonical_id)
"""

    # end-to-end dedup materialization: exact keep-one first, then the same
    # minhash/LSH/Jaccard chain + transitive closure over the exact-kept set
    # only (mirrors operators.dedup.dedup_apply). The minhash CTE chain reads
    # from a CTE named `corpus`, so the full corpus is `corpus0` here and
    # `corpus` is rebound to the exact-stage survivors.
    sqls["t_dedup_apply"] = f"""
WITH RECURSIVE {corpus.replace("corpus AS (", "corpus0 AS (", 1)},
fp AS (
  SELECT doc_id, text, md5(text) AS fingerprint,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS ecanon,
         COUNT(*) OVER (PARTITION BY md5(text)) AS egsz
  FROM corpus0
),
corpus AS (SELECT doc_id, text FROM fp WHERE doc_id = ecanon),
{minhash_ctes},
good AS (SELECT a, b FROM jacs WHERE jac >= {JACCARD_THRESHOLD}),
edges AS (
  SELECT a AS src, b AS dst FROM good
  UNION
  SELECT b AS src, a AS dst FROM good
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
canon AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id),
csz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM canon GROUP BY canonical_id)
SELECT f.doc_id, f.fingerprint,
       CAST(f.egsz AS BIGINT) AS exact_group_size,
       CAST(s.cluster_size AS BIGINT) AS near_cluster_size
FROM canon c
JOIN csz s USING (canonical_id)
JOIN fp f ON f.doc_id = c.id
WHERE c.id = c.canonical_id
"""

    # exact-substring duplication: rolling W-token window fingerprints; a
    # window is duplicated iff it occurs in >= 2 distinct docs (min != max)
    from .operators.dedup import DUP_SPAN_WINDOW as _W

    sqls["t_dup_spans"] = f"""
WITH {corpus},
toks AS (SELECT doc_id, {_TOKS} AS tk FROM corpus),
wins AS (
  SELECT doc_id,
         md5(array_to_string(tk[CAST(u.i AS INT):CAST(u.i + {_W - 1} AS INT)], ' ')) AS fp
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - {_W - 2}, 1))) AS i) u
  WHERE len(tk) >= {_W}
),
dup AS (SELECT fp FROM wins GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)),
per AS (SELECT doc_id, COUNT(*) AS n_windows FROM wins GROUP BY doc_id),
dupper AS (
  SELECT w.doc_id, COUNT(*) AS dup_windows FROM wins w JOIN dup USING (fp)
  GROUP BY w.doc_id
)
SELECT p.doc_id, p.n_windows, CAST(COALESCE(d.dup_windows, 0) AS BIGINT) AS dup_windows
FROM per p LEFT JOIN dupper d USING (doc_id)
"""

    # benchmark decontamination: corpus windows joined against the DISTINCT
    # window-fingerprint set of the eval docs (doc_id % 37 = 0); corpus =
    # augmented pile minus the eval docs themselves
    sqls["t_contamination"] = f"""
WITH {corpus},
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0),
corp AS (
  SELECT doc_id, text FROM corpus
  WHERE NOT (doc_id % 37 = 0 AND doc_id < {NEAR_DUP_OFFSET})
),
btoks AS (SELECT {_TOKS} AS tk FROM bench),
bfp AS (
  SELECT DISTINCT
         md5(array_to_string(tk[CAST(u.i AS INT):CAST(u.i + {_W - 1} AS INT)], ' ')) AS fp
  FROM btoks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - {_W - 2}, 1))) AS i) u
  WHERE len(tk) >= {_W}
),
ctoks AS (SELECT doc_id, {_TOKS} AS tk FROM corp),
cwins AS (
  SELECT doc_id,
         md5(array_to_string(tk[CAST(u.i AS INT):CAST(u.i + {_W - 1} AS INT)], ' ')) AS fp
  FROM ctoks, LATERAL (SELECT unnest(range(1, greatest(len(tk) - {_W - 2}, 1))) AS i) u
  WHERE len(tk) >= {_W}
),
per AS (SELECT doc_id, COUNT(*) AS n_windows FROM cwins GROUP BY doc_id),
cont AS (
  SELECT w.doc_id, COUNT(*) AS c FROM cwins w JOIN bfp USING (fp) GROUP BY w.doc_id
)
SELECT ids.doc_id,
       CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(ct.c, 0) AS BIGINT) AS contam_windows
FROM (SELECT DISTINCT doc_id FROM corp) ids
LEFT JOIN per p USING (doc_id) LEFT JOIN cont ct USING (doc_id)
"""

    # the CUT step: remove every token covered by a cross-doc-duplicated
    # window, rebuild the doc in token order, hash the survivor text
    sqls["t_dup_span_cut"] = f"""
WITH {corpus},
toksq AS (SELECT doc_id, {_TOKS} AS tk FROM corpus),
tokx AS (
  SELECT doc_id, u.t AS tok, CAST(u.i AS BIGINT) AS idx
  FROM toksq, LATERAL (
    SELECT unnest(tk) AS t, generate_subscripts(tk, 1) AS i
  ) u
),
wins AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS i,
         md5(array_to_string(tk[CAST(u.i AS INT):CAST(u.i + {_W - 1} AS INT)], ' ')) AS fp
  FROM toksq, LATERAL (SELECT unnest(range(1, greatest(len(tk) - {_W - 2}, 1))) AS i) u
  WHERE len(tk) >= {_W}
),
dup AS (SELECT fp FROM wins GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)),
cov AS (
  SELECT DISTINCT w.doc_id, CAST(u.x AS BIGINT) AS idx
  FROM wins w JOIN dup USING (fp),
  LATERAL (SELECT unnest(range(w.i, w.i + {_W})) AS x) u
),
kept AS (
  SELECT t.doc_id, t.tok, t.idx FROM tokx t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.idx = t.idx
  )
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS ct, COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       md5(COALESCE(c.ct, '')) AS clean_hash,
       CAST(len(d.tk) AS BIGINT) AS n_tokens,
       CAST(len(d.tk) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
FROM toksq d LEFT JOIN clean c USING (doc_id)
"""

    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s_{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    sqls["t_simhash"] = f"""
WITH {corpus},
tokx AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM corpus),
tokh AS (SELECT doc_id, {_hex_bigint("substr(md5(tok), 1, 8)")} AS h FROM tokx),
bitsum AS (SELECT doc_id, {bit_sums} FROM tokh GROUP BY doc_id)
SELECT doc_id, {sim_expr} AS simhash FROM bitsum
"""

    sqls["t_ngram_jaccard"] = f"""
WITH {corpus},
want AS (
  SELECT doc_id FROM corpus
  WHERE (doc_id % 3 = 0 AND doc_id < 1000000) OR (doc_id >= 1000000 AND doc_id < 2000000)
),
cg AS (
  SELECT DISTINCT c.doc_id, substr(c.text, CAST(u.i AS INT), 5) AS gram
  FROM corpus c JOIN want w ON w.doc_id = c.doc_id,
  LATERAL (SELECT unnest(range(1, greatest(length(c.text) - 3, 1))) AS i) u
  WHERE length(c.text) >= 5
),
pairs AS (SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents WHERE doc_id % 3 = 0),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM cg GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, COUNT(*) AS i
  FROM pairs p JOIN cg ga ON ga.doc_id = p.a
  JOIN cg gb ON gb.doc_id = p.b AND gb.gram = ga.gram
  GROUP BY p.a, p.b
)
SELECT i.a, i.b, CAST(i.i AS DOUBLE) / CAST(na.n + nb.n - i.i AS DOUBLE) AS jac
FROM inter i JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
"""

    # BPE round-1 merge candidates: word counts over the dup-augmented
    # corpus, then weighted adjacent-character-pair counts over the
    # DISTINCT-word table (O(vocab) per-char work — the scale contract the
    # engine's operators/bpe.py pair_stats makes). Deterministic order:
    # (n DESC, pair ASC) for both the top-k cut and the rank.
    sqls["t_bpe_pairs"] = f"""
WITH {corpus},
bwords AS (
  SELECT u.w AS word, COUNT(*) AS wc
  FROM corpus, unnest({_TOKS}) AS u(w)
  GROUP BY 1
),
bpairs AS (
  SELECT substr(word, CAST(g.i AS INT), 1) || ' ' ||
         substr(word, CAST(g.i AS INT) + 1, 1) AS pair,
         SUM(wc) AS n
  FROM bwords, unnest(range(1, length(word))) AS g(i)
  WHERE length(word) >= 2
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank,
       pair, CAST(n AS BIGINT) AS n
FROM bpairs ORDER BY n DESC, pair LIMIT 50
"""

    # Exact BPE encode: re-applies the pinned merge list (bpe.DEMO_MERGES,
    # rank = list position) from scratch with a recursive CTE — each step
    # merges the LOWEST-RANK applicable pair at its LEFTMOST occurrence
    # (list_position returns the first index), exactly the published apply
    # rule incl. self-pair runs; iteration count per word is bounded by
    # word length (each step removes one symbol), and the final
    # segmentation is the unique minimum-length state per word.
    from .operators.bpe import DEMO_MERGES

    _ml = "[" + ", ".join(f"'{a} {b}'" for a, b in DEMO_MERGES) + "]"
    sqls["t_bpe_encode"] = f"""
WITH RECURSIVE
ewords AS (SELECT DISTINCT u.w AS word FROM documents, unnest({_TOKS}) AS u(w)),
seg(word, syms) AS (
  SELECT word,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INT), 1))
  FROM ewords
  UNION ALL
  SELECT word,
         syms[1:CAST(pos - 1 AS INT)]
           || [syms[CAST(pos AS INT)] || syms[CAST(pos + 1 AS INT)]]
           || syms[CAST(pos + 2 AS INT):]
  FROM (
    SELECT word, syms,
           list_position(
             ranks,
             list_aggregate(list_filter(ranks, r -> r IS NOT NULL), 'min')
           ) AS pos
    FROM (
      SELECT word, syms,
             list_transform(range(1, len(syms)), i ->
               nullif(list_position({_ml},
                 syms[CAST(i AS INT)] || ' ' || syms[CAST(i + 1 AS INT)]), 0)
             ) AS ranks
      FROM seg
    )
  ) WHERE pos IS NOT NULL
),
efinal AS (SELECT word, min_by(syms, len(syms)) AS syms FROM seg GROUP BY word),
etoks AS (
  SELECT doc_id, CAST(g.i AS INT) AS pos, tk[CAST(g.i AS INT)] AS word
  FROM (SELECT doc_id, {_TOKS} AS tk FROM documents) t,
  unnest(range(1, len(tk) + 1)) AS g(i)
),
eagg AS (
  SELECT e.doc_id,
         SUM(len(f.syms)) AS n_bpe,
         string_agg(array_to_string(f.syms, '|'), '|' ORDER BY e.pos) AS bpe_text
  FROM etoks e JOIN efinal f USING (word)
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_bpe, 0) AS INT) AS n_bpe,
       coalesce(a.bpe_text, '') AS bpe_text
FROM documents d LEFT JOIN eagg a USING (doc_id)
"""

    sqls["t_token_stats"] = f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
SELECT doc_id,
       CAST(len(tk) AS INT) AS n_tokens,
       CAST(len(list_distinct(tk)) AS INT) AS n_distinct_tokens,
       CAST(length(text) AS INT) AS n_chars,
       CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
         / CAST(len(tk) AS DOUBLE) AS avg_token_len,
       CAST(ceil(CAST(length(text) AS DOUBLE) / 4e0) AS BIGINT) AS n_subwords
FROM toks
"""

    # PII detect + scrub over the residue-augmented corpus; DuckDB's RE2
    # runs the engine's pattern strings verbatim (they are RE2-compatible
    # by construction), masks applied in the same email->phone->ipv4 order
    em, ph, ip = (PII_PATTERNS[k] for k in ("email", "phone", "ipv4"))
    sqls["t_pii"] = f"""
WITH aug AS (SELECT doc_id,
  (CASE WHEN doc_id % 7 = 0
        THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
        ELSE text END
   || CASE WHEN doc_id % 11 = 0 THEN ' call 555-010-4242' ELSE '' END
   || CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.0.1' ELSE '' END) AS text
 FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{em}')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(text, '{ph}')) AS INT) AS n_phone,
  CAST(len(regexp_extract_all(text, '{ip}')) AS INT) AS n_ipv4,
  regexp_replace(regexp_replace(regexp_replace(
    text, '{em}', '[EMAIL]', 'g'), '{ph}', '[PHONE]', 'g'),
    '{ip}', '[IPV4]', 'g') AS clean_text
FROM aug
"""

    # text normalization: explicit [ \t\r\n] class so Java regex and RE2
    # agree byte-for-byte; lowercase is an explicit A-Z translate (NOT
    # lower()) because Java full case mapping diverges from DuckDB's
    # simple mapping on e.g. 'İ'; n_chars_removed = length delta
    sqls["t_normalize"] = r"""
WITH nrm AS (SELECT doc_id, text,
  translate(trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g')),
            'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
            'abcdefghijklmnopqrstuvwxyz') AS norm_text
 FROM documents)
SELECT doc_id, norm_text,
       CAST(length(text) - length(norm_text) AS INT) AS n_chars_removed
FROM nrm
"""

    # sliding-window chunking (max_tokens=40, overlap=8 -> stride 32);
    # DuckDB list slicing is 1-based INCLUSIVE so [a : a+39] == Spark's
    # slice(tk, a, 40)
    sqls["t_chunk"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
g AS (SELECT doc_id, tk, len(tk) AS n,
        CAST(ceil(CAST(GREATEST(len(tk) - 8, 1) AS DOUBLE) / 32e0) AS INT)
          AS nc
      FROM toks WHERE len(tk) > 0),
e AS (SELECT doc_id, tk,
        unnest(generate_series(0, nc - 1)) AS chunk_idx FROM g)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(tk[chunk_idx * 32 + 1 : chunk_idx * 32 + 40]) AS INT)
         AS n_chunk_tokens,
       array_to_string(tk[chunk_idx * 32 + 1 : chunk_idx * 32 + 40], ' ')
         AS chunk_text
FROM e
"""

    # GPT-style sequence packing (seq_len=32): the oracle is the plain
    # single-window global cumsum — the engine's two-level bucket prefix
    # sum must land every doc at the identical global offset; integer //
    # keeps offsets exact
    sqls["t_pack"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
t AS (SELECT doc_id, len(tk) AS n_tokens FROM toks WHERE len(tk) > 0),
c AS (SELECT doc_id, n_tokens,
        CAST(COALESCE(SUM(n_tokens) OVER
          (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS BIGINT) AS tok_start
      FROM t)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       tok_start,
       CAST(tok_start // 32 AS BIGINT) AS first_seq,
       CAST((tok_start + n_tokens - 1) // 32 AS BIGINT) AS last_seq,
       CAST((tok_start + n_tokens - 1) // 32 - tok_start // 32 + 1 AS INT)
         AS n_seqs
FROM c
"""

    # Gopher-style repetition signals: duplicate = occurrences beyond the
    # first; top-2-gram coverage = max count x 2 / tokens; all fractions
    # rounded to 6 dp (cross-engine float-division parity)
    sqls["t_repetition"] = f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
g AS (SELECT doc_id, tk, len(tk) AS n,
        list_filter(string_split(text, chr(10)), x -> x <> '') AS ln,
        CASE WHEN len(tk) >= 2 THEN list_transform(
          generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i + 1])
        ELSE CAST([] AS VARCHAR[]) END AS g2,
        CASE WHEN len(tk) >= 3 THEN list_transform(
          generate_series(1, len(tk) - 2),
          i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
        ELSE CAST([] AS VARCHAR[]) END AS g3
      FROM toks),
f AS (SELECT doc_id, n,
        CASE WHEN len(ln) > 0 THEN round(
          CAST(len(ln) - len(list_distinct(ln)) AS DOUBLE)
          / CAST(len(ln) AS DOUBLE), 6) ELSE 0e0 END AS dup_line_frac,
        CASE WHEN len(g2) > 0 THEN round(
          CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
          / CAST(len(g2) AS DOUBLE), 6) ELSE 0e0 END AS dup_2gram_frac,
        CASE WHEN len(g3) > 0 THEN round(
          CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
          / CAST(len(g3) AS DOUBLE), 6) ELSE 0e0 END AS dup_3gram_frac
      FROM g),
top AS (SELECT doc_id, MAX(c) AS top_c FROM (
          SELECT doc_id, u, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(g2) AS u FROM g) GROUP BY 1, 2)
        GROUP BY 1)
SELECT f.doc_id, CAST(f.n AS BIGINT) AS n_tokens,
       f.dup_line_frac, f.dup_2gram_frac, f.dup_3gram_frac,
       CASE WHEN f.n > 0 THEN round(
         CAST(COALESCE(top.top_c, 0) AS DOUBLE) * 2e0
         / CAST(f.n AS DOUBLE), 6) ELSE 0e0 END AS top_2gram_frac
FROM f LEFT JOIN top ON top.doc_id = f.doc_id
"""

    # dataset-card composition rollup per (source, lang)
    sqls["t_corpus_report"] = f"""
WITH toks AS (SELECT source, lang, text, {_TOKS} AS tk FROM documents)
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(len(tk)) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN len(tk) >= 10 AND
                 CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 2e-1
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok
FROM toks GROUP BY 1, 2
"""

    # per-source token-length quantiles: quantile_cont == Spark's exact
    # linear-interpolation percentile; fractions in scientific notation
    # (DuckDB's bare-decimal literals parse as DECIMAL, not DOUBLE)
    sqls["t_length_quantiles"] = f"""
WITH toks AS (SELECT source, len({_TOKS}) AS n FROM documents)
SELECT source,
       round(quantile_cont(n, 2.5e-1), 4) AS p25,
       round(quantile_cont(n, 5e-1), 4) AS p50,
       round(quantile_cont(n, 7.5e-1), 4) AS p75,
       round(quantile_cont(n, 9e-1), 4) AS p90,
       COUNT(*) AS n_docs
FROM toks GROUP BY source
"""

    # vocabulary statistics: collection frequency + document frequency,
    # top-100 by (term_freq DESC, term)
    sqls["t_vocab"] = f"""
WITH tokx AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT term, COUNT(*) AS term_freq FROM tokx GROUP BY term),
dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS doc_freq FROM tokx GROUP BY term),
r AS (
  SELECT tf.term, tf.term_freq, dfq.doc_freq,
         ROW_NUMBER() OVER (ORDER BY tf.term_freq DESC, tf.term) AS rank
  FROM tf JOIN dfq USING (term)
)
SELECT term, term_freq, doc_freq, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 100
"""

    # BM25 (k1=1.2, b=0.75, idf = ln((N - df + 0.5)/(df + 0.5) + 1)):
    # scores rounded to 6 dp BEFORE ranking, ties break on doc_id —
    # mirrors operators.search.bm25_search
    from .operators.search import BM25_B, BM25_K1

    # DuckDB parses bare decimal literals (1.2) as DECIMAL, not DOUBLE —
    # render the constants in scientific notation to force double arithmetic
    k1 = f"{BM25_K1}e0"
    b = f"{BM25_B}e0"
    _terms = ", ".join(f"'{t}'" for t in ["table", "fast", "row"])
    sqls["t_bm25"] = f"""
WITH tokx AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tokx GROUP BY doc_id),
stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokx
  WHERE term IN ({_terms}) GROUP BY doc_id, term
),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         ln((s.n_docs - dfq.df + 5e-1) / (dfq.df + 5e-1) + 1e0)
           * (tf.tf * ({k1} + 1e0))
           / (tf.tf + {k1} * (1e0 - {b} + {b} * dl.dl / s.avgdl))
           AS c
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
scored AS (SELECT doc_id, round(SUM(c), 6) AS score_r6 FROM contrib GROUP BY doc_id),
r AS (
  SELECT doc_id, score_r6,
         ROW_NUMBER() OVER (ORDER BY score_r6 DESC, doc_id) AS rank
  FROM scored
)
SELECT doc_id, score_r6, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 20
"""

    # DSIR importance weights: hashed-bigram buckets re-derived from
    # scratch (same md5 -> 60-bit -> mod device as every hash oracle),
    # add-1 smoothing over the 4096-bucket feature space, target = docs
    # with doc_id % 10 = 0; per-doc mean rounds at 6 dp (float device)
    _b = _hex_bigint("substr(md5(g), 1, 15)")
    sqls["t_dsir"] = f"""
WITH dtoks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
grams AS (
  SELECT doc_id, tk[CAST(u.i AS INT)] || ' ' || tk[CAST(u.i + 1 AS INT)] AS g
  FROM dtoks, unnest(range(1, len(tk))) AS u(i)
  WHERE len(tk) >= 2
),
binst AS (SELECT doc_id, {_b} % 4096 AS b FROM grams),
srcb AS (SELECT b, COUNT(*) AS cs FROM binst GROUP BY 1),
tgtb AS (SELECT b, COUNT(*) AS ct FROM binst WHERE doc_id % 10 = 0 GROUP BY 1),
tots AS (
  SELECT (SELECT CAST(SUM(cs) AS DOUBLE) FROM srcb) AS ts,
         (SELECT CAST(SUM(ct) AS DOUBLE) FROM tgtb) AS tt
),
ratio AS (
  SELECT COALESCE(s.b, t.b) AS b,
         ln((COALESCE(t.ct, 0) + 1e0) / (o.tt + 4096e0))
           - ln((COALESCE(s.cs, 0) + 1e0) / (o.ts + 4096e0)) AS lr
  FROM srcb s FULL OUTER JOIN tgtb t ON s.b = t.b CROSS JOIN tots o
)
SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       round(AVG(r.lr), 6) AS avg_logratio_r6
FROM binst i JOIN ratio r USING (b) GROUP BY 1
"""

    # hybrid sparse+dense retrieval: BM25 top-50 and cosine top-50 (query
    # = vec 0's embedding) fused by reciprocal rank, 1/(60 + rank) per
    # list — rank-only fusion, so the two scorers' incomparable score
    # scales never meet; round-before-rank as everywhere
    sqls["s_hybrid_rrf"] = f"""
WITH tokx AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tokx GROUP BY doc_id),
stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tokx
  WHERE term IN ({_terms}) GROUP BY doc_id, term
),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         ln((s.n_docs - dfq.df + 5e-1) / (dfq.df + 5e-1) + 1e0)
           * (tf.tf * ({k1} + 1e0))
           / (tf.tf + {k1} * (1e0 - {b} + {b} * dl.dl / s.avgdl))
           AS c
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
sscored AS (SELECT doc_id, round(SUM(c), 6) AS score_r6 FROM contrib GROUP BY doc_id),
stop AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_r6 DESC, doc_id) AS rank
    FROM sscored
  ) WHERE rank <= 50
),
dq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dd AS (
  SELECT e.vec_id, round(list_cosine_similarity(e.embedding, dq.qe), 6) AS sim_r
  FROM embeddings e, dq
),
dtop AS (
  SELECT vec_id, rank FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim_r DESC, vec_id) AS rank
    FROM dd
  ) WHERE rank <= 50
),
fused AS (
  SELECT COALESCE(s.doc_id, d.vec_id) AS doc_id,
         round(COALESCE(1e0 / (60 + s.rank), 0e0)
               + COALESCE(1e0 / (60 + d.rank), 0e0), 9) AS rrf_r9
  FROM stop s FULL OUTER JOIN dtop d ON s.doc_id = d.vec_id
),
rr AS (
  SELECT doc_id, rrf_r9,
         ROW_NUMBER() OVER (ORDER BY rrf_r9 DESC, doc_id) AS rank
  FROM fused
)
SELECT doc_id, rrf_r9, CAST(rank AS BIGINT) AS rank FROM rr WHERE rank <= 20
"""

    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    sqls["t_quality"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents)
SELECT doc_id,
       CAST(len(list_filter(tk, x -> list_contains([{stop_list}], x))) AS DOUBLE)
         / CAST(len(tk) AS DOUBLE) AS stop_ratio,
       CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS distinct_ratio,
       (len(tk) >= 10 AND
        CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 2e-1
       ) AS quality_ok
FROM toks
"""

    langs = sorted(LANG_MARKERS)
    score_cols = ", ".join(
        "len(list_filter(tk, x -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"], x))) AS score_{lang}"
        for lang in langs
    )
    # replicate the engine's argmax chain (strict >, first-lang-wins)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest(score_{lang}, {best})"
    sqls["t_langid"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
scored AS (SELECT doc_id, {score_cols} FROM toks)
SELECT doc_id, {pred} AS lang_pred FROM scored
"""

    # stratified sample: 40 docs per predicted language, ranked by
    # (md5(doc_id), doc_id) — mirrors operators.sampling.stratified_sample
    sqls["t_stratified_sample"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
scored AS (SELECT doc_id, {score_cols} FROM toks),
lang AS (SELECT doc_id, {pred} AS lang_pred FROM scored),
h AS (
  SELECT l.doc_id, l.lang_pred, md5(CAST(l.doc_id AS VARCHAR)) AS hh
  FROM lang l
),
r AS (
  SELECT doc_id, lang_pred,
         ROW_NUMBER() OVER (PARTITION BY lang_pred ORDER BY hh, doc_id) AS sample_rank
  FROM h
)
SELECT doc_id, lang_pred, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= 40
"""

    # mixture draw: availability counts -> binding source -> per-source
    # quotas, identical IEEE arithmetic on identical double literals both
    # sides (floor(n/w), floor(w*n_total)); md5-rank draw as above
    sqls["t_mixture"] = """
WITH wts(source, w) AS (
  VALUES ('src0', 5e-1), ('src1', 25e-2), ('src2', 125e-3), ('src3', 125e-3)
),
mcnt AS (
  SELECT w.source, w.w, COALESCE(c.n, 0) AS n
  FROM wts w LEFT JOIN (
    SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
  ) c USING (source)
),
ntot AS (SELECT MIN(CAST(floor(n / w) AS BIGINT)) AS nt FROM mcnt),
mtake AS (
  SELECT source, CAST(floor(w * nt) AS BIGINT) AS q FROM mcnt, ntot
),
mr AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         ) AS mix_rank
  FROM documents d JOIN mtake USING (source)
)
SELECT r.doc_id, r.source, CAST(r.mix_rank AS BIGINT) AS mix_rank
FROM mr r JOIN mtake t USING (source) WHERE r.mix_rank <= t.q
"""

    from .operators.sampling import TRAIN_PER_4096, VAL_PER_4096

    # integer compare of the 3-hex-digit prefix (mirrors hash_split — a
    # string compare breaks at the 4096 boundary, where the edge is 4 chars)
    _pfx = _hex_bigint("substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)")
    # word-bigram LM score (CCNet-style perplexity filter; mirrors
    # operators.textstats.lm_score): add-0.5 smoothing, mean log
    # P(w2|w1) per doc, rounded to 6 dp BEFORE emission (absorbs the
    # engines' float-sum-order drift — same device as t_bm25)
    sqls["t_lm_score"] = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
big AS (
  SELECT doc_id, tk[CAST(u.i AS INT)] AS w1, tk[CAST(u.i + 1 AS INT)] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(tk), 1))) AS i) u
  WHERE len(tk) >= 2
),
uni AS (
  SELECT w1, COUNT(*) AS c1
  FROM (SELECT unnest(tk) AS w1 FROM toks)
  GROUP BY 1
),
vv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
scored AS (
  SELECT b.doc_id,
         ln((COALESCE(bc.c2, 0) + 5e-1) / (COALESCE(u.c1, 0) + 5e-1 * vv.v)) AS lp
  FROM big b
  LEFT JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
  LEFT JOIN uni u ON u.w1 = b.w1
  CROSS JOIN vv
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round(avg(lp), 6) AS avg_logp
FROM scored GROUP BY doc_id
"""

    sqls["t_hash_split"] = f"""
SELECT doc_id,
       CASE WHEN {_pfx} < {TRAIN_PER_4096} THEN 'train'
            WHEN {_pfx} < {TRAIN_PER_4096 + VAL_PER_4096} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

    # leakage-safe split: near-dup clusters recomputed from scratch (the
    # t_neardup_clusters chain), then the hash_split device keyed on the
    # CANONICAL id — every cluster member must land in one split
    _cpfx = _hex_bigint("substr(md5(CAST(canonical_id AS VARCHAR)), 1, 3)")
    sqls["t_safe_split"] = f"""
WITH RECURSIVE {corpus},
{minhash_ctes},
good AS (SELECT a, b FROM jacs WHERE jac >= {JACCARD_THRESHOLD}),
edges AS (
  SELECT a AS src, b AS dst FROM good
  UNION
  SELECT b AS src, a AS dst FROM good
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
canon AS (SELECT id AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY id)
SELECT doc_id, canonical_id,
       CASE WHEN {_cpfx} < {TRAIN_PER_4096} THEN 'train'
            WHEN {_cpfx} < {TRAIN_PER_4096 + VAL_PER_4096} THEN 'val'
            ELSE 'test' END AS split
FROM canon
"""

    sqls["t_fingerprint"] = """
WITH g AS (
  SELECT doc_id,
         md5(lower(text)) AS fp_full,
         (SELECT MIN(md5(substr(lower(d.text), CAST(u.i AS INT), 8)))
          FROM (SELECT unnest(range(1, greatest(length(lower(d.text)) - 6, 2))) AS i) u
         ) AS fp_min
  FROM documents d
)
SELECT doc_id, fp_full, fp_min FROM g
"""

    # ---------------- similarity over embeddings -----------------

    sqls["s_cosine_topk"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
d AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding, q.qe), 6) AS sim_r
  FROM embeddings e, q
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rank
  FROM d
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 5
"""

    sig_cte = f"""
comp AS (
  SELECT vec_id, CAST(u.e AS DOUBLE) AS e, u.i
  FROM embeddings, LATERAL (
    SELECT unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
  ) u
),
sigbits AS (
  SELECT vec_id, p.p,
         SUM(e * (CAST(((p.p * 131 + i) * 2654435761) % 1000 AS DOUBLE) / 1e3 - 5e-1)) AS s
  FROM comp, (SELECT unnest(range(0, {N_PLANES})) AS p) p
  GROUP BY vec_id, p.p
),
sig AS (
  SELECT vec_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM sigbits GROUP BY vec_id
)
""".strip()

    band_w = N_PLANES // N_BANDS
    bands_cte = f"""
bands AS (
  SELECT vec_id, b.b AS band,
         substr(sig, CAST(b.b * {band_w} + 1 AS INT), {band_w}) AS bsig
  FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS b) b
)
""".strip()

    sqls["s_ann_lsh"] = f"""
WITH {sig_cte},
{bands_cte},
qb AS (
  SELECT vec_id AS query_id, band, bsig FROM bands WHERE vec_id < 5
),
cand_ids AS (
  SELECT DISTINCT qb.query_id, e.vec_id
  FROM bands e JOIN qb ON qb.band = e.band AND qb.bsig = e.bsig
  WHERE e.vec_id <> qb.query_id
),
cand AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(e.embedding, q.embedding), 6) AS sim_r
  FROM cand_ids c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings q ON q.vec_id = c.query_id
),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3
"""

    sig_cte_aug = sig_cte.replace(
        "FROM embeddings,",
        "FROM emb_aug AS embeddings,",
    )
    sqls["s_embedding_neardup"] = f"""
WITH emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET}, embedding FROM embeddings WHERE vec_id % 50 = 0
),
{sig_cte_aug},
{bands_cte},
pair_ids AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT p.a, p.b,
         round(list_cosine_similarity(ea.embedding, eb.embedding), 6) AS sim_r
  FROM pair_ids p
  JOIN emb_aug ea ON ea.vec_id = p.a
  JOIN emb_aug eb ON eb.vec_id = p.b
)
SELECT a, b, sim_r FROM pairs WHERE sim_r >= 0.999
"""

    # embedding near-dup canonicalization: transitive closure of the
    # verified cosine pair graph (recursive CTE, mirrors t_neardup_clusters)
    sqls["s_embedding_clusters"] = f"""
WITH RECURSIVE emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {EMB_DUP_OFFSET}, embedding FROM embeddings WHERE vec_id % 50 = 0
),
{sig_cte_aug},
{bands_cte},
pair_ids AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id
),
good AS (
  SELECT p.a, p.b
  FROM pair_ids p
  JOIN emb_aug ea ON ea.vec_id = p.a
  JOIN emb_aug eb ON eb.vec_id = p.b
  WHERE round(list_cosine_similarity(ea.embedding, eb.embedding), 6) >= 0.999
),
edges AS (
  SELECT a AS src, b AS dst FROM good
  UNION
  SELECT b AS src, a AS dst FROM good
),
reach(id, r) AS (
  SELECT vec_id, vec_id FROM emb_aug
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
canon AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id),
csz AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM canon GROUP BY canonical_id)
SELECT c.id AS vec_id, c.canonical_id, s.cluster_size
FROM canon c JOIN csz s USING (canonical_id)
"""

    # IVF: centroid c = embedding of vec_id c*STRIDE (deterministic sample
    # quantizer, mirrors operators.similarity.ivf_centroids); every vector
    # assigned to its nearest centroid, queries probe the N_PROBE nearest
    # cells, exact cosine top-k among probed candidates only.
    from .operators.similarity import CENTROID_STRIDE, N_CENTROIDS, N_PROBE

    sqls["s_ann_ivf"] = f"""
WITH cent AS (
  SELECT CAST(vec_id / {CENTROID_STRIDE} AS INT) AS cid, embedding AS cv
  FROM embeddings
  WHERE vec_id % {CENTROID_STRIDE} = 0 AND vec_id < {N_CENTROIDS * CENTROID_STRIDE}
),
asg AS (
  SELECT vec_id, cid, ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY sim_r DESC, cid) AS rn
  FROM (SELECT e.vec_id, c.cid,
               round(list_cosine_similarity(e.embedding, c.cv), 6) AS sim_r
        FROM embeddings e CROSS JOIN cent c)
),
cell AS (SELECT vec_id, cid FROM asg WHERE rn = 1),
probes AS (
  SELECT query_id, cid FROM (
    SELECT e.vec_id AS query_id, c.cid, ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding, c.cv), 6) DESC,
                      c.cid) AS rn
    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 5
  ) WHERE rn <= {N_PROBE}
),
cand AS (
  SELECT p.query_id, ce.vec_id,
         round(list_cosine_similarity(e.embedding, q.embedding), 6) AS sim_r
  FROM cell ce
  JOIN probes p ON ce.cid = p.cid
  JOIN embeddings e ON e.vec_id = ce.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE ce.vec_id <> p.query_id
),
r AS (
  SELECT query_id, vec_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim_r DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3
"""

    # Lloyd k-means (3 unrolled rounds, mirrors operators.similarity.
    # kmeans_fit): same deterministic sample init as ivf_centroids, same
    # assignment rule as s_ann_ivf (cosine ROUNDED to 6 dp, cid-ascending
    # tie-break — the rounding absorbs the engines' float-sum-order drift
    # in the double-precision means), per-component double means between
    # rounds. Gated projection is the integer (cid, n_assigned) of the
    # final assignment.
    def _km_assign(cent: str) -> str:
        return f"""(
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
      ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 6)
               DESC, c.cid) AS rn
    FROM embeddings e CROSS JOIN {cent} c) WHERE rn = 1
)"""

    def _km_means(asg: str) -> str:
        return f"""(
  SELECT cid, list(m ORDER BY pos) AS cv FROM (
    SELECT a.cid, comp.pos, avg(comp.x) AS m
    FROM {asg} a JOIN comp ON comp.vec_id = a.vec_id
    GROUP BY a.cid, comp.pos)
  GROUP BY cid
)"""

    sqls["s_kmeans_ivf"] = f"""
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
c0 AS (
  SELECT CAST(vec_id / {CENTROID_STRIDE} AS INT) AS cid,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings
  WHERE vec_id % {CENTROID_STRIDE} = 0 AND vec_id < {N_CENTROIDS * CENTROID_STRIDE}
),
a1 AS {_km_assign("c0")},
c1 AS {_km_means("a1")},
a2 AS {_km_assign("c1")},
c2 AS {_km_means("a2")},
a3 AS {_km_assign("c2")}
SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_assigned FROM a3 GROUP BY cid
"""

    # ---------------- multimodal decode (deterministic stub) -----------------

    bld = datagen.buildings_sql_cte()
    ref = "'tile/z12/' || qk_media"
    sqls["m_media_decode"] = f"""
WITH {bld}
SELECT doc_id, qk_media AS media_qk,
       md5({ref}) AS feat_hash,
       {_hex_bigint(f"substr(md5({ref}), 1, 2)")} AS feat0,
       {_hex_bigint(f"substr(md5({ref}), 3, 2)")} AS feat1,
       CAST(256 AS INT) AS width, CAST(256 AS INT) AS height
FROM bld WHERE has_geom
"""

    # frame sampling: clip length = (first md5 digest byte % 8) + 1, frames
    # at stride 2 (operators.multimodal.sample_frames' deterministic rule)
    sqls["m_frame_sample"] = f"""
WITH {bld},
f AS (
  SELECT doc_id, {ref} AS media_ref,
         CAST(({_hex_bigint(f"substr(md5({ref}), 1, 2)")} % 8) + 1 AS INT) AS n_frames
  FROM bld WHERE has_geom
)
SELECT doc_id, media_ref, CAST(u.i AS INT) AS frame_idx
FROM f, LATERAL (SELECT unnest(range(0, f.n_frames, 2)) AS i) u
"""

    # ---------------- events -----------------

    # as-of join: DuckDB's NATIVE ASOF LEFT JOIN is the oracle — an
    # independent implementation of the same point-in-time semantics the
    # engine's union + carry-forward window produces. (key, ts)-duplicate
    # right rows reduce by MAX first (the engine's documented tie rule).
    sqls["e_asof"] = """
WITH v AS (
  SELECT user_id, ts, MAX(value) AS value
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, v.value AS asof_value,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""

    # the streaming twin (stateful carry-forward register) must land on
    # the IDENTICAL result set — same oracle, verbatim
    sqls["e_asof_stream"] = sqls["e_asof"]
    # likewise the funnel twin's monotone stage pointer: drained MAX per
    # user == the batch fold, so the stage counts share the oracle
    # (assigned after e_funnel is defined below)

    # hopping windows: Spark assigns each event to exactly length/slide
    # epoch-aligned windows; the oracle derives the same starts
    # arithmetically — floor(epoch/slide)*slide - k*slide for k in 0..3
    # (900000000 us = 15 min). An alignment bug in either engine flips
    # every window_start and hash-fails.
    sqls["e_hopping"] = """
SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                      - k.k * 900000000) AS window_start,
       event_type, COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value_r4
FROM events, unnest(range(0, 4)) AS k(k)
GROUP BY 1, 2
"""

    # ordered funnel: independent formulation as chained min-timestamp CTE
    # joins (first view, first click at-or-after it, first purchase
    # at-or-after that) vs the engine's single-shuffle stage-pointer fold
    sqls["e_funnel"] = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id
  WHERE e.event_type = 'click' AND e.ts >= u1.t1 GROUP BY 1
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= u2.t2 GROUP BY 1
)
SELECT 1 AS stage, 'view' AS stage_name, CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', CAST((SELECT COUNT(*) FROM u2) AS BIGINT)
UNION ALL
SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM u3) AS BIGINT)
"""

    sqls["e_funnel_stream"] = sqls["e_funnel"]

    sqls["e_windowed_agg"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value_r4
FROM events GROUP BY 1, 2
"""

    sqls["h_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 4) AS sum_qty,
       round(SUM(l_extendedprice), 4) AS sum_base_price,
       round(SUM(l_extendedprice * (1e0 - l_discount)), 4) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2
"""

    sqls["h_top_customers"] = """
WITH per_cust AS (
  SELECT o_custkey, round(SUM(o_totalprice), 4) AS total FROM orders GROUP BY 1
),
j AS (
  SELECT n.n_name, c.c_custkey, p.total,
         ROW_NUMBER() OVER (PARTITION BY n.n_name ORDER BY p.total DESC, c.c_custkey) AS rank
  FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name, c_custkey, total, CAST(rank AS BIGINT) AS rank FROM j WHERE rank <= 3
"""

    sqls["e_sessionize"] = """
WITH o AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o
)
SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
FROM s GROUP BY 1, 2
"""

    # streaming twin (applyInPandasWithState, append mode): emits exactly
    # the CLOSED sessions — every session except each user's final one,
    # which stays open in state when the availableNow stream ends
    sqls["e_sessionize_stream"] = """
WITH o AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM o
),
sess AS (
  SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
  FROM s GROUP BY 1, 2
)
SELECT user_id, session_id, n_events, t_start, t_end
FROM sess
WHERE session_id < (SELECT MAX(session_id) FROM sess s2 WHERE s2.user_id = sess.user_id)
"""
    return sqls
