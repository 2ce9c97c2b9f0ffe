"""DuckDB oracle SQL for the banded-LSH dedup family.

The Spark operators (operators/dedup.py) use ENGINE-PORTABLE base
hashes — md5 hex prefixes converted to BIGINT — precisely so this
module can re-state the *entire* pipeline (exact pre-pass → shingles →
minhash/simhash signature → banding → capped buckets → in-bucket
pairs) as one DuckDB SQL string per registered query. That upgrades
dedup_minhash_lsh_pairs / dedup_simhash_pairs / dedup_lsh_bucket_census
/ dedup_minhash_clusters from rows-only driver checks to full
row+schema+value-hash checks.

The permutation constants, band geometry, and bucket cap are imported
from operators.dedup so the two sides can never drift.
"""

from __future__ import annotations

from iq_to_hdl_migration_spark.operators.dedup import (
    BANDS,
    BUCKET_CAP,
    N_HASHES,
    PERMS,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    SIMHASH_CHUNK_BITS,
    SIMHASH_CHUNKS,
    _P,
)

_PERMS_DUCK = "[" + ", ".join(
    f"{{'a': {a}::BIGINT, 'b': {b}::BIGINT}}" for a, b in PERMS) + "]"

# Shared prefix: exact-dedup pre-pass + minhash signatures over the
# representatives. `base` mirrors _exact_prepass (min doc_id per md5
# digest keeps the representative); `sigs` mirrors with_minhash.
_MINHASH_PREFIX = rf"""
base AS (
    SELECT CAST(doc_id AS BIGINT) AS id, text,
           MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY md5(text))
               AS keep_id
    FROM documents
),
reps AS (SELECT id, text FROM base WHERE id = keep_id),
toks AS (
    SELECT id, string_split_regex(lower(trim(text)), '\s+') AS tok
    FROM reps
),
sh AS (
    SELECT id, CASE WHEN len(tok) >= 3
        THEN list_transform(range(0, len(tok) - 2),
                i -> array_to_string(list_slice(tok, i + 1, i + 3), ' '))
        ELSE [array_to_string(tok, ' ')] END AS shingles
    FROM toks
),
sigs AS (
    SELECT id, list_transform({_PERMS_DUCK},
        p -> list_min(list_transform(
                 list_transform(shingles,
                     s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)
                          % 2147483648),
                 h -> (p.a * h + p.b) % {_P}))) AS minhash
    FROM sh
),
bands AS (
    SELECT id, minhash, band,
           list_slice(minhash, band * {ROWS_PER_BAND} + 1,
                      band * {ROWS_PER_BAND} + {ROWS_PER_BAND}) AS band_sig
    FROM sigs, (SELECT unnest(range(0, {BANDS})) AS band)
)
"""

# In-bucket candidate pairs over cap-truncated buckets, deduped, with
# estimated Jaccard = fraction of agreeing minhash positions.
_MINHASH_CAND = f"""
capped AS (
    SELECT * FROM (
        SELECT id, minhash, band, band_sig,
               ROW_NUMBER() OVER (PARTITION BY band, band_sig
                                  ORDER BY id) AS rn
        FROM bands) t
    WHERE rn <= {BUCKET_CAP}
),
cand AS (
    SELECT DISTINCT least(a.id, b.id) AS id_a,
           greatest(a.id, b.id) AS id_b,
           CAST(len(list_filter(range(1, {N_HASHES} + 1),
                                i -> a.minhash[i] = b.minhash[i]))
                AS DOUBLE) / {N_HASHES}.0 AS est_jaccard
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
)
"""


def minhash_pairs_oracle(threshold: float = 0.5) -> str:
    """Twin of dedup.lsh_candidate_pairs(threshold=...)."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND}
    SELECT id_a, id_b, est_jaccard FROM cand
    WHERE est_jaccard >= {threshold}
    UNION ALL
    SELECT keep_id AS id_a, id AS id_b, 1.0::DOUBLE AS est_jaccard
    FROM base WHERE id != keep_id
    """


def lsh_bucket_census_oracle(cap: int = BUCKET_CAP) -> str:
    """Twin of dedup.minhash_bucket_census: per-band bucket population
    over UNCAPPED buckets (the census observes what the cap would
    truncate, so it must see the raw widths)."""
    return f"""
    WITH {_MINHASH_PREFIX},
    per_bucket AS (
        SELECT band, band_sig, COUNT(*) AS n_members
        FROM bands GROUP BY band, band_sig
    )
    SELECT CAST(band AS INTEGER) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n_members) AS BIGINT) AS max_members,
           CAST(SUM(CASE WHEN n_members > {cap} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overflow_buckets,
           CAST(SUM(CASE WHEN n_members > {cap} THEN n_members - {cap}
                    ELSE 0 END) AS BIGINT) AS members_truncated
    FROM per_bucket GROUP BY band
    """


def minhash_clusters_oracle(threshold: float = 0.7) -> str:
    """Twin of dedup_minhash_clusters: connected components over the
    LSH pair list (candidates >= threshold, plus exact-dup links) via
    recursive transitive closure, then per-cluster member counts.
    Same recursive-CTE pattern as the A5 transitive-closure oracle
    (queries/catalog_ops.py)."""
    return f"""
    WITH RECURSIVE {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b FROM cand WHERE est_jaccard >= {threshold}
        UNION
        SELECT keep_id AS id_a, id AS id_b FROM base WHERE id != keep_id
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach (u, v) AS (
        SELECT u, u FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS id, MIN(v) AS component FROM reach GROUP BY u)
    SELECT component AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM labels GROUP BY component HAVING COUNT(*) > 1
    """


def simhash_pairs_oracle(max_hamming: int = 3) -> str:
    """Twin of dedup.simhash_candidate_pairs: 60-bit md5-based SimHash,
    4x15-bit chunk banding, capped buckets, exact hamming verify, plus
    exact-dup links at hamming 0."""
    chunk_mask = (1 << SIMHASH_CHUNK_BITS) - 1
    return rf"""
    WITH base AS (
        SELECT CAST(doc_id AS BIGINT) AS id, text,
               MIN(CAST(doc_id AS BIGINT)) OVER (PARTITION BY md5(text))
                   AS keep_id
        FROM documents
    ),
    reps AS (SELECT id, text FROM base WHERE id = keep_id),
    th AS (
        SELECT id,
               list_transform(string_split_regex(lower(trim(text)), '\s+'),
                   t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT))
                   AS hs
        FROM reps
    ),
    sigs AS (
        SELECT id,
               CAST(list_sum(list_transform(range(0, {SIMHASH_BITS}),
                   b -> CASE WHEN list_sum(list_transform(hs,
                            h -> CASE WHEN (h >> b) & 1 = 1
                                 THEN 1 ELSE -1 END)) > 0
                        THEN (1::BIGINT << b) ELSE 0::BIGINT END))
                   AS BIGINT) AS sig
        FROM th
    ),
    chunks AS (
        SELECT id, sig, chunk_idx,
               (sig >> (CAST(chunk_idx AS INTEGER) * {SIMHASH_CHUNK_BITS}))
                   & {chunk_mask} AS chunk
        FROM sigs, (SELECT unnest(range(0, {SIMHASH_CHUNKS})) AS chunk_idx)
    ),
    capped AS (
        SELECT * FROM (
            SELECT id, sig, chunk_idx, chunk,
                   ROW_NUMBER() OVER (PARTITION BY chunk_idx, chunk
                                      ORDER BY id) AS rn
            FROM chunks) t
        WHERE rn <= {BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT least(a.id, b.id) AS id_a,
               greatest(a.id, b.id) AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        FROM capped a JOIN capped b
          ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.id < b.id
    )
    SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {max_hamming}
    UNION ALL
    SELECT keep_id AS id_a, id AS id_b, 0 AS hamming
    FROM base WHERE id != keep_id
    """


def cross_split_contamination_oracle(threshold: float = 0.5) -> str:
    """Twin of text_contamination_neardup: per-source decontamination
    report — train-split docs (md5 bucket < 'cc', the split_train_test
    rule) that near-duplicate a held-out (valid/test) doc via the SAME
    flood-safe banded pipeline as dedup_minhash_lsh_pairs, plus a
    one-hop closure over certain-duplicate (est_jaccard = 1.0)
    train-train pairs so exact copies of a contaminated keeper are
    flagged too."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b, est_jaccard FROM cand
        WHERE est_jaccard >= {threshold}
        UNION ALL
        SELECT keep_id AS id_a, id AS id_b, 1.0::DOUBLE AS est_jaccard
        FROM base WHERE id != keep_id
    ),
    split AS (
        SELECT CAST(doc_id AS BIGINT) AS id, source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train' ELSE 'held' END AS split
        FROM documents
    ),
    tagged AS (
        SELECT p.id_a, p.id_b, p.est_jaccard,
               sa.split AS split_a, sb.split AS split_b
        FROM pairs p
        JOIN split sa ON sa.id = p.id_a
        JOIN split sb ON sb.id = p.id_b
    ),
    direct AS (
        SELECT id_a AS id, est_jaccard FROM tagged
        WHERE split_a = 'train' AND split_b = 'held'
        UNION ALL
        SELECT id_b AS id, est_jaccard FROM tagged
        WHERE split_b = 'train' AND split_a = 'held'
    ),
    direct_ids AS (SELECT DISTINCT id FROM direct),
    via AS (
        SELECT t.id_b AS id FROM tagged t
        JOIN direct_ids d ON d.id = t.id_a
        WHERE t.est_jaccard = 1.0
          AND t.split_a = 'train' AND t.split_b = 'train'
        UNION ALL
        SELECT t.id_a AS id FROM tagged t
        JOIN direct_ids d ON d.id = t.id_b
        WHERE t.est_jaccard = 1.0
          AND t.split_a = 'train' AND t.split_b = 'train'
    ),
    contaminated AS (
        SELECT DISTINCT id
        FROM (SELECT id FROM direct_ids UNION ALL SELECT id FROM via)
    ),
    dmax AS (SELECT id, MAX(est_jaccard) AS max_jac FROM direct GROUP BY id)
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_train_docs,
           CAST(SUM(CASE WHEN c.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           MAX(dmax.max_jac) AS max_est_jaccard
    FROM split s
    LEFT JOIN contaminated c ON c.id = s.id
    LEFT JOIN dmax ON dmax.id = s.id
    WHERE s.split = 'train'
    GROUP BY s.source
    """


def threshold_sweep_oracle() -> str:
    """Twin of dedup_threshold_sweep: per 0.1-wide estimated-jaccard
    band, candidate-pair count and distinct docs involved. Bands are
    exact: est_jaccard is k/32 (k agreeing positions), and k/32 * 10 =
    5k/16 is a power-of-two-denominator rational, so FLOOR(x*10)/10 is
    bit-identical in both engines."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b, est_jaccard FROM cand WHERE est_jaccard >= 0.5
        UNION ALL
        SELECT keep_id AS id_a, id AS id_b, 1.0::DOUBLE AS est_jaccard
        FROM base WHERE id != keep_id
    ),
    banded AS (
        SELECT FLOOR(est_jaccard * 10) / 10 AS jac_band, id_a, id_b
        FROM pairs
    ),
    stacked AS (
        SELECT jac_band, id_a AS id FROM banded
        UNION ALL
        SELECT jac_band, id_b AS id FROM banded
    )
    SELECT b.jac_band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MAX(d.n_docs) AS BIGINT) AS n_docs
    FROM banded b
    JOIN (SELECT jac_band, COUNT(DISTINCT id) AS n_docs
          FROM stacked GROUP BY jac_band) d
      ON b.jac_band = d.jac_band
    GROUP BY b.jac_band
    """


def incremental_pairs_oracle(threshold: float = 0.5) -> str:
    """Twin of dedup_incremental_pairs: with ids monotone in arrival
    order and no bucket overflow (true at gate scales), the incremental
    pass over batch2 = the FULL recompute's pairs restricted to those
    touching batch2 — and since id_a < id_b, 'touching batch2' is
    exactly id_b > cut."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    allpairs AS (
        SELECT id_a, id_b, est_jaccard FROM cand
        WHERE est_jaccard >= {threshold}
        UNION ALL
        SELECT keep_id AS id_a, id AS id_b, 1.0::DOUBLE AS est_jaccard
        FROM base WHERE id != keep_id
    )
    SELECT id_a, id_b, est_jaccard FROM allpairs
    WHERE id_b > (SELECT CAST(FLOOR(MAX(doc_id) * 0.6) AS BIGINT)
                  FROM documents)
    """


def grand_funnel_oracle() -> str:
    """Twin of curation_grand_funnel: whole-corpus survivor counts
    through exact dedup -> near-dup dedup (min-id-wins over >= 0.7
    candidate pairs) -> near-dup decontamination (train docs that
    near-duplicate held-out docs at >= 0.5, one-hop certain-duplicate
    closure; held-out docs are unaffected by this stage)."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b, est_jaccard FROM cand
        UNION ALL
        SELECT keep_id AS id_a, id AS id_b, 1.0::DOUBLE AS est_jaccard
        FROM base WHERE id != keep_id
    ),
    losers AS (
        SELECT DISTINCT id_b AS id FROM pairs WHERE est_jaccard >= 0.7
    ),
    split AS (
        SELECT CAST(doc_id AS BIGINT) AS id,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train' ELSE 'held' END AS split
        FROM documents
    ),
    tagged AS (
        SELECT p.id_a, p.id_b, p.est_jaccard,
               sa.split AS split_a, sb.split AS split_b
        FROM (SELECT * FROM pairs WHERE est_jaccard >= 0.5) p
        JOIN split sa ON sa.id = p.id_a
        JOIN split sb ON sb.id = p.id_b
    ),
    direct_ids AS (
        SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM tagged
            WHERE split_a = 'train' AND split_b = 'held'
            UNION ALL
            SELECT id_b AS id FROM tagged
            WHERE split_b = 'train' AND split_a = 'held')
    ),
    via AS (
        SELECT t.id_b AS id FROM tagged t
        JOIN direct_ids d ON d.id = t.id_a
        WHERE t.est_jaccard = 1.0
          AND t.split_a = 'train' AND t.split_b = 'train'
        UNION ALL
        SELECT t.id_a AS id FROM tagged t
        JOIN direct_ids d ON d.id = t.id_b
        WHERE t.est_jaccard = 1.0
          AND t.split_a = 'train' AND t.split_b = 'train'
    ),
    contaminated AS (
        SELECT DISTINCT id
        FROM (SELECT id FROM direct_ids UNION ALL SELECT id FROM via)
    ),
    flags AS (
        SELECT b.id,
               (b.id = b.keep_id) AS is_keeper,
               (b.id = b.keep_id AND l.id IS NULL) AS is_nd_keeper,
               (b.id = b.keep_id AND l.id IS NULL AND c.id IS NULL)
                   AS is_clean
        FROM base b
        LEFT JOIN losers l ON l.id = b.id
        LEFT JOIN contaminated c ON c.id = b.id
    )
    SELECT stage, n_docs,
           CAST(n_docs AS DOUBLE)
               / CAST(MAX(n_docs) OVER () AS DOUBLE) AS survival_rate
    FROM (
        SELECT '0_ingested' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM flags
        UNION ALL
        SELECT '1_exact_keeper',
               CAST(SUM(CASE WHEN is_keeper THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
        UNION ALL
        SELECT '2_near_dup_keeper',
               CAST(SUM(CASE WHEN is_nd_keeper THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM flags
        UNION ALL
        SELECT '3_decontaminated',
               CAST(SUM(CASE WHEN is_clean THEN 1 ELSE 0 END) AS BIGINT)
        FROM flags
    ) s
    """


def dedup_weights_oracle(threshold: float = 0.7) -> str:
    """Twin of mlprep_dedup_aware_weights: soft dedup — every document
    keeps a training weight of 1e6 // near-dup-cluster-size ppm
    (singletons weigh 1.0), aggregated per source. Reuses the
    minhash-clusters transitive closure; weights are exact integers
    and the effective-document ratio is one double division."""
    return f"""
    WITH RECURSIVE {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b FROM cand WHERE est_jaccard >= {threshold}
        UNION
        SELECT keep_id AS id_a, id AS id_b FROM base WHERE id != keep_id
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach (u, v) AS (
        SELECT u, u FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS id, MIN(v) AS component FROM reach GROUP BY u),
    sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
              FROM labels GROUP BY component),
    w AS (
        SELECT d.source,
               CAST(1000000 // COALESCE(s.csize, 1) AS BIGINT) AS w_ppm
        FROM documents d
        LEFT JOIN labels l ON l.id = d.doc_id
        LEFT JOIN sizes s ON s.component = l.component
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w_ppm) AS BIGINT) AS sum_weight_ppm,
           CAST(SUM(w_ppm) AS DOUBLE) / 1e6 AS effective_docs,
           1.0 - (CAST(SUM(w_ppm) AS DOUBLE) / 1e6)
                 / CAST(COUNT(*) AS DOUBLE) AS dup_tax
    FROM w GROUP BY source
    """


def cluster_quality_oracle(threshold: float = 0.7) -> str:
    """Twin of dedup_cluster_quality_report: the minhash_clusters
    closure joined back to documents for per-cluster composition
    stats."""
    return f"""
    WITH RECURSIVE {_MINHASH_PREFIX}, {_MINHASH_CAND},
    pairs AS (
        SELECT id_a, id_b FROM cand WHERE est_jaccard >= {threshold}
        UNION
        SELECT keep_id AS id_a, id AS id_b FROM base WHERE id != keep_id
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach (u, v) AS (
        SELECT u, u FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (SELECT u AS id, MIN(v) AS component FROM reach GROUP BY u)
    SELECT l.component AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
           CAST(COUNT(*) - COUNT(DISTINCT md5(d.text)) AS BIGINT)
               AS n_exact_dup_surplus
    FROM labels l JOIN documents d ON d.doc_id = l.id
    GROUP BY l.component HAVING COUNT(*) > 1
    """


def jaccard_calibration_oracle(threshold: float = 0.5,
                               scale: int = 20) -> str:
    """Twin of dedup_jaccard_calibration: estimator-error histogram of
    MinHash est_jaccard vs the exact distinct-shingle-set Jaccard over
    the SAME candidate pairs (digest-prepass exact links excluded —
    they are true duplicates, not estimates)."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    shs AS (SELECT id, list_distinct(shingles) AS s FROM sh),
    x AS (
        SELECT c.est_jaccard,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(a.s) + len(b.s)
                        - len(list_intersect(a.s, b.s)) AS DOUBLE)
                   AS exact_jaccard
        FROM cand c JOIN shs a ON a.id = c.id_a
        JOIN shs b ON b.id = c.id_b
        WHERE c.est_jaccard >= {threshold}
    )
    SELECT CAST(FLOOR((est_jaccard - exact_jaccard) * {scale}.0)
                AS INTEGER) AS err_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MIN(exact_jaccard) AS min_exact, MAX(exact_jaccard) AS max_exact,
           MIN(est_jaccard) AS min_est, MAX(est_jaccard) AS max_est
    FROM x GROUP BY 1
    """


def mixture_shift_oracle(threshold: float = 0.7) -> str:
    """Twin of dedup_mixture_shift_report: per-source corpus share
    before vs after near-dup removal (min-id-wins losers over the
    >= threshold LSH pair list), floor-quantized ppm + signed delta."""
    return f"""
    WITH {_MINHASH_PREFIX}, {_MINHASH_CAND},
    losers AS (
        SELECT DISTINCT id_b AS id FROM cand
        WHERE est_jaccard >= {threshold}
        UNION
        SELECT DISTINCT id FROM base WHERE id != keep_id
    ),
    d AS (
        SELECT CAST(doc_id AS BIGINT) AS id, source FROM documents
    ),
    kept AS (
        SELECT d.id, d.source FROM d
        LEFT JOIN losers l ON l.id = d.id WHERE l.id IS NULL
    ),
    bf AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before FROM d
        GROUP BY source
    ),
    af AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after FROM kept
        GROUP BY source
    ),
    tot AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS t_before,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS t_after
    )
    SELECT b.source, b.n_before, COALESCE(a.n_after, 0) AS n_after,
           CAST(b.n_before * 1000000 // t.t_before AS BIGINT)
               AS before_ppm,
           CAST(COALESCE(a.n_after, 0) * 1000000 // t.t_after
                AS BIGINT) AS after_ppm,
           CAST(COALESCE(a.n_after, 0) * 1000000 // t.t_after
                - b.n_before * 1000000 // t.t_before AS BIGINT)
               AS delta_ppm
    FROM bf b LEFT JOIN af a ON a.source = b.source CROSS JOIN tot t
    """
