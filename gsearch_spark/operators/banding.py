"""Stage 2: signatures -> salted LSH band keys (the "index build").

Replaces the reference's HNSW graph construction
(``hnsw.parallel_insert``, gsearch ``src/dna/dnasketch.rs:421-448``) with
the scalable Spark-native equivalent: every signature explodes into
``bands`` keys; items sharing a (band_id, band_hash) bucket are candidate
neighbors.  The (bands x rows_per_band) split is the LSH analog of the
reference's ef/nbng quality-vs-cost knobs (``README.md:680-689``).

Band hashes are computed **JVM-side** with ``xxhash64`` over the band's
minhash slots — whole-stage-codegen'd, no Python in this stage.

Skew (north_rule: "partitioning / shuffle / skew handled explicitly"):
hot buckets — e.g. thousands of identical all-black thumbnails — would
turn the bucket self-join into O(n^2).  We:
  1. count bucket sizes (``groupBy(band_id, band_hash).count()``),
  2. broadcast the (tiny) hot-bucket list back,
  3. split hot buckets into ``ceil(size / hot_band_threshold)`` (capped at
     ``band_salts``) sub-buckets, salt = hash(image_id, band_id) so each
     band partitions the same items DIFFERENTLY — across ``bands``
     independent band sets two co-bucketed items still meet w.p.
     1 - (1 - 1/S)^bands, and connected-components only needs a spanning
     set of edges, not all of them.

SimHash banding: the 64-bit simhash splits into ``simhash_bands`` chunks
(16 bits each by default); two signatures within Hamming distance
(simhash_bands - 1) share at least one intact chunk (pigeonhole), giving
exact coverage of small Hamming balls — the Hamming-neighborhood search
the reference does over sketch slots (``src/bin/bindash.rs:93-97``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BANDS_SCHEMA = "band_id int, band_hash bigint, salt int, image_id string"
CAPTION_BAND_ID = 3000


def explode_minhash_bands(signatures: DataFrame, bands: int,
                          rows_per_band: int) -> DataFrame:
    """signatures -> (band_id, band_hash, image_id); JVM-side hashing."""
    band_hashes = []
    for b in range(bands):
        slots = [F.element_at("minhash", b * rows_per_band + j + 1)
                 for j in range(rows_per_band)]
        band_hashes.append(F.xxhash64(F.lit(b), *slots))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*band_hashes))
                    .alias("band_id", "band_hash")))


def explode_simhash_bands(signatures: DataFrame, simhash_bands: int,
                          band_id_offset: int = 1000) -> DataFrame:
    """simhash -> (band_id, band_hash, image_id) by chunk-PAIR equality.

    The 64-bit simhash splits into ``simhash_bands`` chunks; the band key
    is each unordered PAIR of chunks (C(k,2) bands of 2x16=32 bits for
    k=4).  Pigeonhole: a pair within Hamming distance <= (k-2) damages at
    most k-2 chunks, leaving >= 2 intact, so SOME pair-band matches —
    exact coverage of the Hamming<=2 ball, probabilistic above.  Single
    16-bit chunks are NOT usable as keys at scale: with n >> 2^16 rows,
    random chunk collisions alone generate O(n^2 / 2^16) candidate pairs
    per band (observed: 1.8M junk pairs at 188k rows); 32-bit pair keys
    push random collisions to O(n^2 / 2^32), i.e. noise.

    band_id is offset so simhash buckets never collide with minhash
    buckets in the unioned bands table.
    """
    width = 64 // simhash_bands
    mask = (1 << width) - 1
    chunk = [F.shiftright(F.col("simhash"), b * width).bitwiseAND(
        F.lit(mask)) for b in range(simhash_bands)]
    combos = []
    for i in range(simhash_bands):
        for j in range(i + 1, simhash_bands):
            combos.append(F.xxhash64(F.lit(band_id_offset + len(combos)),
                                     chunk[i], chunk[j]))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*combos))
                    .alias("band_pos", "band_hash"))
            .select((F.col("band_pos") + F.lit(band_id_offset))
                    .alias("band_id"), "band_hash", "image_id"))


def explode_phash_bands(signatures: DataFrame, phash_bands: int = 4,
                        band_id_offset: int = 2000) -> DataFrame:
    """phash -> (band_id, band_hash, image_id) by chunk-PAIR equality
    (C(4,2)=6 bands of 2x16=32-bit keys).

    Covers the regime MinHash is weakest in: a re-encode that flips ~2
    phash bits drops shingle Jaccard to ~0.6 where 16x8-band detection
    is only ~24%, but 2 flips damage at most 2 of 4 chunks, leaving an
    intact chunk pair => exact Hamming<=2 coverage (3-4 flips are caught
    probabilistically here plus by the MinHash/SimHash nets).  Single
    16-bit chunks are unusable: phash bits are DCT-sign-structured and
    heavily correlated across images, and the 2^16 keyspace produced
    ~1.7M junk pairs at 188k rows; 32-bit pair keys push collisions down
    by the second chunk's entropy, and what remains is absorbed by
    salting + star policy + the phash prefilter.
    """
    width = 64 // phash_bands
    mask = (1 << width) - 1
    chunk = [F.shiftright(F.col("phash"), b * width).bitwiseAND(
        F.lit(mask)) for b in range(phash_bands)]
    combos = []
    for i in range(phash_bands):
        for j in range(i + 1, phash_bands):
            combos.append(F.xxhash64(F.lit(band_id_offset + len(combos)),
                                     chunk[i], chunk[j]))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*combos))
                    .alias("band_pos", "band_hash"))
            .select((F.col("band_pos") + F.lit(band_id_offset))
                    .alias("band_id"), "band_hash", "image_id"))


def salt_hot_buckets(bands_df: DataFrame, hot_threshold: int,
                     max_salts: int,
                     max_hot_buckets: int = 100_000) -> DataFrame:
    """Assign per-row salts; only buckets above hot_threshold are split.

    The hot-bucket list is tiny by construction (duplicate blow-ups, not
    the norm) and is broadcast — no shuffle of the big side beyond the
    bucket count aggregation (map-side partial agg keeps that cheap).
    The stats pass is collected eagerly: ``F.broadcast`` pulls it to the
    driver anyway, and an eager local relation avoids recomputing (or
    having to persist) the exploded band table — persisting it here once
    poisoned a later incremental-add run through Spark's plan-keyed
    cache reuse.

    The collect is BOUNDED: only the ``max_hot_buckets`` hottest buckets
    are salted (deterministic order: size desc, then key), so the
    driver-side list is O(max_hot_buckets) no matter the input size.
    Buckets past the cap stay unsalted — still CORRECT (candidate
    emission's star policy caps their pairs at 2m-3) just less balanced;
    the truncation is logged, never silent.
    """
    import logging

    spark = bands_df.sparkSession
    hot_rows = (bands_df.groupBy("band_id", "band_hash")
                .agg(F.count(F.lit(1)).alias("bucket_n"))
                .filter(F.col("bucket_n") > hot_threshold)
                .withColumn(
                    "n_salt",
                    F.least(F.lit(max_salts),
                            F.ceil(F.col("bucket_n") / hot_threshold)
                            .cast("int")))
                .orderBy(F.desc("bucket_n"), "band_id", "band_hash")
                .limit(max_hot_buckets + 1)
                .select("band_id", "band_hash", "n_salt")
                .collect())
    if len(hot_rows) > max_hot_buckets:
        hot_rows = hot_rows[:max_hot_buckets]
        logging.getLogger(__name__).warning(
            "salt_hot_buckets: more than %d hot buckets; salting only the "
            "%d hottest (tail stays unsalted, star policy bounds its pairs)",
            max_hot_buckets, max_hot_buckets)
    stats = spark.createDataFrame(
        hot_rows, schema="band_id int, band_hash bigint, n_salt int")
    return (bands_df
            .join(F.broadcast(stats), ["band_id", "band_hash"], "left")
            .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
            .withColumn(
                "salt",
                F.when(F.col("n_salt") <= 1, F.lit(0)).otherwise(
                    F.pmod(F.xxhash64("image_id", "band_id"),
                           F.col("n_salt")).cast("int")))
            .select("band_id", "band_hash", "salt", "image_id"))


def explode_all_bands(signatures: DataFrame, cfg) -> DataFrame:
    """signatures -> UNSALTED (band_id, band_hash, image_id) across every
    band family.  Shared by the build path (which salts the result) and
    the probe path of :func:`gsearch_spark.operators.request.request`
    (which joins it against a stored salted table on (band_id, band_hash)
    — salting only matters for the self-join's skew, not for probing)."""
    from gsearch_spark.operators.signatures import EMPTY_CAPTION_HASH

    mh = explode_minhash_bands(signatures, cfg.bands, cfg.rows_per_band)
    sh = explode_simhash_bands(signatures, cfg.simhash_bands)
    # caption-identity band: every verifiable near-dup class except
    # caption-substring (suffix pass) and empty-caption rows shares its
    # normalized caption, so ONE exact band covers re-encodes and pixel
    # perturbations deterministically — junk is just same-caption
    # non-dups (hard negatives), killed by the phash prefilter before
    # any decode.  Massively cheaper than banding structured phash bits.
    cap = (signatures
           .filter(F.col("cap_hash") != F.lit(EMPTY_CAPTION_HASH))
           .select(F.lit(CAPTION_BAND_ID).alias("band_id"),
                   F.col("cap_hash").alias("band_hash"), "image_id"))
    # phash chunk-pair bands for ALL rows: the only net with GUARANTEED
    # Hamming<=2 coverage of the re-encode regime.  A lossy re-encode at
    # PSNR 40-43 dB flips 1-2 phash bits but can flip 40-60 pixel-feature
    # simhash bits (measured: the simhash net is fragile exactly where
    # re-encodes live), and a simultaneously TRUNCATED caption drops
    # minhash J to ~0.5 and kills the caption-identity band — so without
    # these bands a (re-encoded pixels, substring caption) dup can evade
    # every net (caught by tests/test_suffix_array.py adversarial case).
    # Junk cost is bounded: 32-bit pair keys (not raw 16-bit chunks),
    # salting, star policy, and the phash prefilter before any decode.
    ph = explode_phash_bands(signatures, cfg.phash_bands)
    return mh.unionByName(sh).unionByName(cap).unionByName(ph)


def build_bands(signatures: DataFrame, cfg) -> DataFrame:
    """Full banding stage: minhash ∪ simhash ∪ caption ∪ phash bands, salted.

    The exploded band table feeds two passes (bucket stats, then the salt
    join); the stats side is collected eagerly inside salt_hot_buckets
    (it is broadcast-sized by construction), so no persist is needed and
    no cached plan can leak into later runs over the same checkpoint.
    """
    return salt_hot_buckets(explode_all_bands(signatures, cfg),
                            cfg.hot_band_threshold, cfg.band_salts,
                            max_hot_buckets=cfg.max_hot_buckets)
