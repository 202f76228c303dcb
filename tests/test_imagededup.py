"""Image near-duplicate detection: generic Hamming banding vs brute
force, and the end-to-end bytes -> phash -> pairs path on a corpus with
planted perturbed variants."""

import numpy as np
import pytest

from rgm import imagededup as rid
from rgm import images as rim


def _brute_pairs(ids, hashes, max_hamming):
    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    out = set()
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1 :]
        d = np.array([bin(int(v)).count("1") for v in x])
        for j in np.nonzero(d <= max_hamming)[0]:
            a, b = ids[i], ids[i + 1 + j]
            out.add((min(a, b), max(a, b)))
    return out


def test_hash_neardup_matches_brute_force(spark):
    """Pigeonhole banding is exact: operator pairs == O(n^2) popcount."""
    rng = np.random.default_rng(5)
    base = rng.integers(-(2**62), 2**62, 120, dtype=np.int64)
    hashes = list(base)
    # planted near pairs: flip 1..6 bits of existing hashes (unsigned
    # domain, then wrap back to the signed-long encoding Spark stores)
    for k in range(30):
        u = int(base[k]) & ((1 << 64) - 1)
        for f in rng.choice(64, size=1 + k % 6, replace=False):
            u ^= 1 << int(f)
        hashes.append(u - (1 << 64) if u >= (1 << 63) else u)
    ids = [f"h{i:04d}" for i in range(len(hashes))]
    df = spark.createDataFrame(
        list(zip(ids, [int(x) for x in hashes])), "id string, h long"
    ).repartition(8)
    got = {
        (r["id_a"], r["id_b"])
        for r in rid.hash_neardup_pairs(df, "id", "h", max_hamming=6).collect()
    }
    assert got == _brute_pairs(ids, hashes, 6)
    assert len(got) >= 25  # the planted pairs are actually found


def test_hash_neardup_param_validation(spark):
    df = spark.createDataFrame([("a", 1)], "id string, h long")
    with pytest.raises(ValueError):
        rid.hash_neardup_pairs(df, "id", "h", max_hamming=8, chunks=8)
    with pytest.raises(ValueError):
        rid.hash_neardup_pairs(df, "id", "h", max_hamming=3, chunks=7)


def test_image_neardup_end_to_end(spark):
    """bytes -> decode -> phash -> banded pairs on a planted-variant
    corpus: matches numpy brute force over the same decoded hashes, and
    recovers a healthy share of the planted (base, variant) pairs."""
    df = rid.images_with_variants(spark, n_base=240, variant_every=4).cache()
    pairs = {
        (r["id_a"], r["id_b"])
        for r in rid.image_neardup_pairs(df, max_hamming=6).collect()
    }
    # independent reference: decode+hash each image locally
    rows = df.collect()
    ids = [r["image_id"] for r in rows]
    hashes = [
        rim.avg_phash(rim.decode_image(r["bytes"], r["fmt"], r["w"], r["h"]))
        for r in rows
    ]
    assert pairs == _brute_pairs(ids, hashes, 6)
    planted = {
        (f"img_{i:012d}", f"var_{i:012d}") for i in range(0, 240, 4)
    }
    found_planted = pairs & planted
    # the tuned perturbation keeps ~90% of variants within 6 phash bits
    assert len(found_planted) >= 0.8 * len(planted)
    df.unpersist()


def test_bucket_cap_drops_oversized_buckets_only(spark):
    """With a cap, a degenerate cluster of identical hashes is dropped
    from pair expansion while ordinary near pairs survive."""
    rows = [(f"dup{i:03d}", 12345) for i in range(50)]
    rows += [("x0", 1 << 20), ("x1", (1 << 20) | 3)]  # hamming 2
    df = spark.createDataFrame(rows, "id string, h long")
    capped = {
        (r["id_a"], r["id_b"])
        for r in rid.hash_neardup_pairs(
            df, "id", "h", max_hamming=6, max_bucket_size=10
        ).collect()
    }
    assert capped == {("x0", "x1")}
    full = rid.hash_neardup_pairs(df, "id", "h", max_hamming=6).count()
    assert full == 50 * 49 // 2 + 1
