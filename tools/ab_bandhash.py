"""Controlled A/B: rotate-xor band fold vs native xxhash64 band hash.

Same process, same session, alternating implementations, 3 draws each
(min-of-draws reported) at the given sf_dir — the SCALE.md §7h
measurement for the janino-overflow fix.  The OLD fold is reproduced
inline (it no longer exists in dedup.py).

Usage: python tools/ab_bandhash.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def old_band_hashes(sig, id_col, out_id, num_hashes, bands):
    """The pre-fix rotate-xor fold (exponential expression tree)."""
    from deltalake2db_spark.operators.dedup import _rotl

    rows_per_band = num_hashes // bands
    band_cols = []
    for i in range(bands):
        acc = F.element_at("sig", i * rows_per_band + 1)
        for j in range(1, rows_per_band):
            acc = _rotl(acc, 13).bitwiseXOR(
                F.element_at("sig", i * rows_per_band + j + 1)
            )
        band_cols.append(
            F.struct(
                F.lit(i).alias("band"),
                _rotl(acc, 13).bitwiseXOR(F.lit(i)).alias("bh"),
            )
        )
    return sig.select(
        F.col(id_col).alias(out_id), F.explode(F.array(*band_cols)).alias("b")
    ).select(out_id, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark
    from deltalake2db_spark.operators import dedup

    spark = get_spark("ab_bandhash", cpus=int(__import__("os").environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    new_impl = dedup._band_hashes
    gates = ["q_minhash_lsh", "q_cross_dedup"]
    qs = entry.queries()

    # warm both paths once (codegen caches, file listing)
    for g in gates:
        qs[g](spark, sf_dir).count()

    results: dict[str, dict[str, list[float]]] = {
        g: {"old": [], "new": []} for g in gates
    }
    for draw in range(3):
        for name, impl in (("old", old_band_hashes), ("new", new_impl)):
            dedup._band_hashes = impl
            for g in gates:
                t0 = time.monotonic()
                n = qs[g](spark, sf_dir).count()
                results[g][name].append(time.monotonic() - t0)
        print(f"draw {draw}: " + ", ".join(
            f"{g} old={results[g]['old'][-1]:.2f}s new={results[g]['new'][-1]:.2f}s"
            for g in gates), flush=True)
    dedup._band_hashes = new_impl

    print("\nmin-of-3:")
    for g in gates:
        o, n = min(results[g]["old"]), min(results[g]["new"])
        print(f"  {g}: old {o:.2f}s  new {n:.2f}s  ({o / n:.2f}x)")


if __name__ == "__main__":
    main()
