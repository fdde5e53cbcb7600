"""Deduplication operators for large-scale corpus curation.

Four families, all declarative DataFrame plans (no Python in the hot
path; every hash is md5-derived so the DuckDB oracles compute identical
values):

  exact          sha256-groupBy — keeper = min doc_id per content hash
  ngram-jaccard  candidate pairs from docs sharing a RARE shingle
                 (df <= max_shingle_df, default 100) -> exact Jaccard
                 over the CAPPED shingle sets >= threshold
  minhash-lsh    k-shingles -> H minhashes -> B bands -> banded
                 candidate join -> exact-Jaccard verification
  simhash        48-bit weighted fingerprint; near-dup pairs by Hamming
                 distance with banded blocking

BEHAVIOR CHANGE (round 2): ngram_jaccard_dedup's max_shingle_df default
went from None to MAX_SHINGLE_DF (=100), and the cap applies BEFORE the
per-doc shingle sets are built — so on corpora with hot shingles the
reported Jaccard values themselves change (they're Jaccard over the
rare-shingle subsets), not just the candidate set. Pass
max_shingle_df=None for the old exact-over-all-shingles semantics.

Scale notes (the 100 TB story):
  * verification is CANDIDATE-DRIVEN everywhere: per-doc shingle sets are
    gathered once and joined to the candidate pairs by doc_id — cost
    O(|candidates| x doc size), never a shingle-keyed self-join;
  * the ngram path's pair GENERATION join is bounded by dropping
    "stopword shingles" (df > max_shingle_df, default MAX_SHINGLE_DF) —
    same rule on both engines;
  * MinHash LSH replaces the quadratic candidate set with O(docs x bands)
    shuffle keys; band keys are the shuffle salt;
  * remaining joins key on doc_id/band — AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wiser_spark.functions.tokenize import tokens_col

# Mersenne prime 2^31-1: (a*x+b) stays < 2^62, exact in int64/BIGINT on
# both engines
MERSENNE_P = 2_147_483_647
HASH_MULT_A = 2_654_435_761  # Knuth multiplicative constant
HASH_MULT_B = 40_503


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — bit-identical to the
    DuckDB expression ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duckdb_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ------------------------------------------------------------------ exact
def exact_dedup(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(sha256, keeper_doc_id, n_copies): one row per distinct content."""
    return docs.groupBy(F.sha2(F.col(content_col), 256).alias("sha256")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


# --------------------------------------------------------------- shingles
def shingles(
    docs: DataFrame, k: int = 3, content_col: str = "content"
) -> DataFrame:
    """Distinct HASHED token k-grams per doc: (doc_id, shingle BIGINT).

    The 60-bit md5 hash is taken at the source so every downstream
    join/set shuffles 8-byte longs instead of multi-word strings (the
    same hash the DuckDB oracle computes; a collision — ~n^2/2^60 —
    would affect both engines identically, so parity holds by
    construction)."""
    toks = tokens_col(F.col(content_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    return (
        docs.filter(F.size(toks) >= k)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", md5_long(F.col("gram")).alias("shingle"))
        .distinct()
    )


def _jaccard_pairs(sh: DataFrame, candidates: DataFrame | None) -> DataFrame:
    """Exact Jaccard for a candidate pair set: (doc_a, doc_b, jaccard).

    CANDIDATE-DRIVEN: the verification cost is O(|candidates| x shingles
    per doc), never O(sum df^2). Each doc's shingle set is gathered once
    (doc-keyed groupBy — the same shuffle key the build already used) and
    the candidate pairs join those sets by doc_id; the intersection is a
    JVM array_intersect per pair. No shingle-keyed self-join exists in
    this plan, so a hot "stopword shingle" costs only its one set row.

    With candidates=None the pair set is generated first (docs sharing
    >= 1 shingle) and then verified the same way; that generation join is
    the inherent cost of EXACT n-gram Jaccard and must be bounded by a
    shingle-df cap upstream (ngram_jaccard_dedup defaults one).
    """
    sets_ = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh_set"),
        F.count("*").alias("n_sh"),
    )
    if candidates is None:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        candidates = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
    sets_a = sets_.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sets_b = sets_.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    n_inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    return (
        candidates.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select(
            "doc_a", "doc_b",
            (n_inter.cast("double")
             / (F.col("n_a") + F.col("n_b") - n_inter).cast("double")
             ).alias("jaccard"),
        )
    )


# Default shingle-df cap: a shingle occurring in more documents than this
# is a "stopword shingle" and is dropped BEFORE pair generation (the same
# rule applies in the DuckDB oracle, curation_sql.ngram_jaccard_sql).
# Near-dup pairs share many RARE shingles, so the cap only removes noise
# pairs; without it one hot shingle makes the pair join quadratic.
MAX_SHINGLE_DF = 100


def ngram_jaccard_dedup(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = MAX_SHINGLE_DF,
    content_col: str = "content",
) -> DataFrame:
    """Near-dup pairs by exact k-gram Jaccard: (doc_a, doc_b, jaccard).

    max_shingle_df bounds the candidate join (see MAX_SHINGLE_DF); pass
    None to disable (exact semantics over ALL shingles — quadratic on hot
    shingles, small corpora only)."""
    sh = shingles(docs, k, content_col)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    return _jaccard_pairs(sh, None).filter(F.col("jaccard") >= threshold)


# Band-bucket skew guard (r06, VERDICT item 4): a (band, key) bucket
# with B members generates B^2/2 candidate pairs BEFORE distinct() can
# save it — one million-row exact-dup cluster on a crawl corpus makes a
# single bucket quadratic. The guard excludes buckets over the cap from
# candidate GENERATION (their members can still pair via their other
# bands). It is deliberately NOT silent: the excluded buckets are a
# queryable DataFrame (oversized_band_buckets / oversized_simhash_buckets)
# for the caller to log or spot-verify, and the documented contract is
# to run exact_dedup FIRST — identical documents have identical
# signatures, so collapsing exact dups to one representative removes
# the dominant source of giant buckets before banding ever sees them.
# The default cap (10k members -> 50M raw pairs per bucket) is far above
# anything a near-dup (non-identical) cluster produces, so results on
# normal corpora are unchanged.
MAX_BAND_BUCKET = 10_000


def _cap_band_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Keep only banded rows whose (band, key) bucket has <= max_bucket
    members — a count-aggregate + left-semi join over the slim banded
    rows (one extra shuffle of (band, key) longs; no payload moves)."""
    if max_bucket is None:
        return banded
    ok = (
        banded.groupBy("band", "key")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") <= max_bucket)
        .select("band", "key")
    )
    return banded.join(ok, ["band", "key"], "left_semi")


def _oversized_buckets(banded: DataFrame, max_bucket: int) -> DataFrame:
    return (
        banded.groupBy("band", "key")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )


# ------------------------------------------------------------ minhash-lsh
def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, mh0..mh{H-1}): H permutation-style minhashes per doc,
    WIDE — H min-aggregates over ONE shuffle, no H-x row explode (the
    round-1 long-format plan pushed H rows per shingle through the
    exchange).

    h_i(x) = (a_i * x + b_i) mod P over the 60-bit md5 value of the
    shingle (shingles() already emits that hash); a_i, b_i derived from
    i so both engines regenerate them.
    """
    x = F.col("shingle") % MERSENNE_P
    aggs = []
    for i in range(num_hashes):
        a = ((i + 1) * HASH_MULT_A) % MERSENNE_P
        b = ((i + 1) * HASH_MULT_B) % MERSENNE_P
        aggs.append(
            F.min((F.lit(a) * x + F.lit(b)) % MERSENNE_P).alias(f"mh{i}")
        )
    return sh.groupBy("doc_id").agg(*aggs)


def _minhash_banded(
    docs: DataFrame, num_hashes: int, bands: int, k: int, content_col: str,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, key) banded LSH rows — shared by the dedup plan
    and the oversized-bucket audit."""
    assert num_hashes % bands == 0
    sh = sh if sh is not None else shingles(docs, k, content_col)
    sig = minhash_signatures(sh, num_hashes)
    r = num_hashes // bands
    # band key per table: the "i:minhash" strings of the band, sorted
    # lexically — identical bytes to the round-1 collect_list formulation
    # and to the DuckDB oracle's string_agg(... ORDER BY)
    band_keys = F.array(*[
        F.concat_ws("_", F.sort_array(F.array(*[
            F.concat_ws(":", F.lit(str(i)), F.col(f"mh{i}"))
            for i in range(bnd * r, (bnd + 1) * r)
        ])))
        for bnd in range(bands)
    ])
    return sig.select("doc_id", F.posexplode(band_keys).alias("band", "key"))


def minhash_lsh_dedup(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    content_col: str = "content",
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified:
    (doc_a, doc_b, jaccard). rows/band = num_hashes // bands.

    ``max_band_bucket`` bounds the per-(band, key) candidate bucket (see
    MAX_BAND_BUCKET — run exact_dedup first; audit what a cap excluded
    with ``oversized_band_buckets``); None disables the guard."""
    sh = shingles(docs, k, content_col).cache()
    banded = _cap_band_buckets(
        _minhash_banded(docs, num_hashes, bands, k, content_col, sh=sh),
        max_band_bucket,
    )
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "key")
    candidates = (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_pairs(sh, candidates).filter(F.col("jaccard") >= threshold)


def oversized_band_buckets(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    content_col: str = "content",
    max_band_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """(band, key, bucket_n) for every LSH bucket OVER the cap — the
    audit surface for minhash_lsh_dedup's skew guard (log it, or feed
    the member docs to a dedicated exact/verify pass)."""
    return _oversized_buckets(
        _minhash_banded(docs, num_hashes, bands, k, content_col),
        max_band_bucket,
    )


# --------------------------------------------------------------- clusters
def near_dup_clusters(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, keeper_doc_id): connected components over a near-dup
    pair graph; keeper = the component's min doc_id (singletons keep
    themselves). This is the operator that turns pairwise dedup output
    into an actionable keep/drop list.

    Distributed min-label propagation: each round every doc takes the
    min label among itself and its neighbors — one join + one groupBy
    per round, O(component diameter) rounds (near-dup components are
    shallow: dup clusters are quasi-cliques). The driver loop only
    checks a per-round convergence COUNT; labels are localCheckpoint'd
    so lineage stays flat."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
        )
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("label"))
    labels = labels.localCheckpoint()
    while True:
        prop = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label"))
                 < F.col("label")).alias("chg"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("keeper_doc_id"))


# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 48


def simhash(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, simhash): 48-bit tf-weighted SimHash of the token set.

    NO bit explode: each (doc, term) row carries one signed tf per bit
    (a 48-wide column list), and the per-doc vote is 48 element-wise
    SUM aggregates over ONE shuffle — rows through the exchange stay
    O(doc x distinct terms), not 48x that (the round-1 plan's blowup)."""
    toks = docs.select("doc_id", F.explode(tokens_col(F.col(content_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    h = md5_long(F.col("term"))
    # (h >> bit) & 1 at a literal shift per column: exact power-of-two
    # division in doubles (h < 2^60 keeps floor exact for bit >= 8; for
    # bits 0..7 h/2^bit can exceed 2^53 — mask h to the low 48 bits
    # first so every division is exact)
    h48 = h.bitwiseAND(F.lit((1 << SIMHASH_BITS) - 1))
    base = tf.select("doc_id", h48.alias("h"), "tf")

    def w_of(b: int):
        bit_set = (
            F.floor(F.col("h") / F.lit(float(1 << b))).cast("long")
            .bitwiseAND(F.lit(1)) == 1
        )
        return F.when(bit_set, F.col("tf")).otherwise(-F.col("tf"))

    votes = base.groupBy("doc_id").agg(
        *[F.sum(w_of(b)).alias(f"v{b}") for b in range(SIMHASH_BITS)]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        term_b = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term_b if fp is None else fp + term_b
    return votes.select("doc_id", fp.alias("simhash"))


# SimHash banding: 48 bits -> 4 x 12-bit keys. Any pair within Hamming
# distance <= 3 differs in <= 3 bits, so by pigeonhole at least one of
# the 4 bands is identical — banded blocking has NO false negatives up
# to distance n_bands - 1.
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def _simhash_banded(fp: DataFrame) -> DataFrame:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    keys = F.array(*[
        F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * i).bitwiseAND(F.lit(mask))
        for i in range(SIMHASH_BANDS)
    ])
    return fp.select(
        "doc_id", "simhash", F.posexplode(keys).alias("band", "key")
    )


def simhash_pairs(
    docs: DataFrame,
    max_distance: int = 3,
    content_col: str = "content",
    fingerprints: DataFrame | None = None,
    max_band_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance: (doc_a, doc_b,
    hamming <= max_distance).

    Candidates come from 12-bit banded blocking (shuffle key = (band,
    key), O(docs x 4) rows — never an all-pairs join); verification is a
    single JVM popcount per candidate pair. max_distance must stay
    < SIMHASH_BANDS for the blocking to be exact.

    ``max_band_bucket`` bounds the per-(band, key) bucket (see
    MAX_BAND_BUCKET; a member of an excluded bucket can still pair via
    its other 3 bands, so the distance-<=3 exactness is kept unless a
    pair's EVERY matching band is oversized — identical docs, which the
    documented exact_dedup-first contract removes). Audit exclusions
    with ``oversized_simhash_buckets``; None disables the guard."""
    assert max_distance < SIMHASH_BANDS, "banding is exact only below n_bands"
    fp = fingerprints if fingerprints is not None else simhash(docs, content_col)
    banded = _cap_band_buckets(_simhash_banded(fp), max_band_bucket)
    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"),
        "band", "key",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"),
        "band", "key",
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            .cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


def oversized_simhash_buckets(
    docs: DataFrame,
    content_col: str = "content",
    fingerprints: DataFrame | None = None,
    max_band_bucket: int = MAX_BAND_BUCKET,
) -> DataFrame:
    """(band, key, bucket_n) for every SimHash band bucket OVER the cap
    — the audit surface for simhash_pairs' skew guard."""
    fp = fingerprints if fingerprints is not None else simhash(docs, content_col)
    return _oversized_buckets(_simhash_banded(fp), max_band_bucket)
