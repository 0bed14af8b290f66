#!/usr/bin/env python
"""Paired A/B: bucket self-join vs packed collect_list pair expansion.

VERDICT r12 ask #4: `dedup_minhash_lsh` carries the suite's largest
exchange count (27); prototype packing the band candidate generation
into ONE exchange and measure at sf1/sf10 like the r12 quantiles
experiment — ship only if it wins, a committed negative result is
acceptable output.

Two operators share the bucket self-join shape and are probed together:

- MinHash bands: band_rows self-joined on (band, bh) shuffles the
  candidate stream TWICE (both join sides) + once for the pair dedup.
  Packed form: groupBy(band, bh) + collect_list(_rep) + higher-order
  i<j pair expansion — one exchange for candidates + the dedup.
- CDC chunk postings: counts agg + left_semi + self-join shuffles the
  postings THREE times by _fp. Packed form: one groupBy(_fp) with the
  2..max_chunk_docs liveness filter as size(docs) — postings consumed
  ONCE, so the persist/cache lifecycle can drop out entirely.

Equivalence: within a bucket the members are distinct (signature-reps /
distinct postings), so all i<j pairs of the sorted member array are
exactly the self-join's rep_a < rep_b pairs. Verified by collecting
both FULL QUERY outputs at --check-sf before any timing.

Skew note recorded with the result: collect_list materializes a hot
bucket as one array (bounded at max_chunk_docs=100 for CDC only AFTER
collection; the self-join's count prefilter drops boilerplate grams
before any k^2 work). The A/B decides whether the exchange savings pay
for that at these scales.

Usage: python scripts/bucket_pack_probe.py [reps=3] [--sf DIR]
       [--check-sf DIR] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pywrangler_spark.session import get_spark  # noqa: E402
from pywrangler_spark.util import tie_caches_to_result  # noqa: E402
from pywrangler_spark.operators.dedup import (  # noqa: E402
    MinHashLSHPairs,
    cdc_chunk_neardup_pairs,
    minhash_signatures,
)


def _sorted_pairs(arr, a_name: str, b_name: str):
    """All i<j pairs of a distinct array as structs, a < b."""
    s = F.array_sort(arr)
    return F.flatten(
        F.transform(
            s,
            lambda x, i: F.transform(
                F.slice(s, i + F.lit(2), F.size(s)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


class PackedMinHashLSHPairs(MinHashLSHPairs):
    """Candidate generation via one groupBy(band, bh) exchange."""

    def __call__(self, df: DataFrame) -> DataFrame:
        num_hashes, bands = self.num_hashes, self.bands
        r = num_hashes // bands
        min_sim = self.min_signature_similarity

        sigs = df.transform(
            minhash_signatures(
                self.id_column, self.text_column, num_hashes,
                self.shingle_k, self.seed,
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted.append(sigs)
        dsigs = sigs.groupBy("_sig").agg(
            F.min("_id").alias("_rep")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted.append(dsigs)

        band_rows = dsigs.select(
            "_rep",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    ",", F.slice("_sig", j * r + 1, r)
                                )
                            ).alias("bh"),
                        )
                        for j in range(bands)
                    ]
                )
            ).alias("b"),
        ).select("_rep", "b.band", "b.bh")

        # PACKED: one exchange for the candidate stream
        grp = (
            band_rows.groupBy("band", "bh")
            .agg(F.collect_list("_rep").alias("reps"))
            .filter(F.size("reps") >= 2)
        )
        pairs = (
            grp.select(
                F.explode(_sorted_pairs(F.col("reps"), "rep_a", "rep_b"))
                .alias("p")
            )
            .select("p.rep_a", "p.rep_b")
            .dropDuplicates(["rep_a", "rep_b"])
        )

        sig_a = dsigs.select(
            F.col("_rep").alias("rep_a"), F.col("_sig").alias("sig_a")
        )
        sig_b = dsigs.select(
            F.col("_rep").alias("rep_b"), F.col("_sig").alias("sig_b")
        )
        scored = pairs.join(sig_a, "rep_a").join(sig_b, "rep_b")
        sim = (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.lit(float(num_hashes))
        ).alias("sig_similarity")
        rep_pairs = scored.select("rep_a", "rep_b", sim).filter(
            F.col("sig_similarity") >= min_sim
        )
        members = sigs.join(dsigs, "_sig").select("_id", "_rep")
        mem_a = members.select(
            F.col("_rep").alias("rep_a"), F.col("_id").alias("_ia")
        )
        mem_b = members.select(
            F.col("_rep").alias("rep_b"), F.col("_id").alias("_ib")
        )
        cross = (
            rep_pairs.join(mem_a, "rep_a")
            .join(mem_b, "rep_b")
            .select(
                F.least("_ia", "_ib").alias("id_a"),
                F.greatest("_ia", "_ib").alias("id_b"),
                "sig_similarity",
            )
        )
        within = (
            mem_a.join(
                mem_a.select(F.col("rep_a"), F.col("_ia").alias("_ib")),
                "rep_a",
            )
            .filter(F.col("_ia") < F.col("_ib"))
            .select(
                F.col("_ia").alias("id_a"),
                F.col("_ib").alias("id_b"),
                F.lit(1.0).alias("sig_similarity"),
            )
            .filter(F.col("sig_similarity") >= min_sim)
        )
        out = cross.unionByName(within)
        tie_caches_to_result(out, self._persisted)
        return out


class PackedCdcChunkNeardupPairs(cdc_chunk_neardup_pairs):
    """Posting liveness + candidate pairs via one groupBy(_fp)
    exchange; postings consumed once, so no persist at all."""

    def __call__(self, df: DataFrame) -> DataFrame:
        from pywrangler_spark.operators.chunk import chunk_content_defined

        chunks = df.transform(
            chunk_content_defined(
                self.id_column, self.text_column, avg_tokens=self.avg_tokens
            )
        )
        postings = (
            chunks.filter(F.col("n_tokens") >= self.min_chunk_tokens)
            .select(
                F.xxhash64(F.col("chunk")).alias("_fp"),
                F.col(self.id_column).alias("_doc"),
            )
            .distinct()
        )
        grp = (
            postings.groupBy("_fp")
            .agg(F.collect_list("_doc").alias("docs"))
            .filter(
                (F.size("docs") >= 2)
                & (F.size("docs") <= self.max_chunk_docs)
            )
        )
        pairs = grp.select(
            F.explode(_sorted_pairs(F.col("docs"), "id_a", "id_b"))
            .alias("p")
        ).select("p.id_a", "p.id_b")
        return (
            pairs.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= self.min_shared)
        )


class HybridCdcChunkNeardupPairs(cdc_chunk_neardup_pairs):
    """Count prefilter kept (boilerplate fingerprints never enter a
    collect buffer), but the self-join is replaced by collect_list on
    the live set — the post-semi-join groupBy inherits the join's _fp
    hash partitioning, so candidate generation adds NO exchange."""

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        from pywrangler_spark.operators.chunk import chunk_content_defined

        chunks = df.transform(
            chunk_content_defined(
                self.id_column, self.text_column, avg_tokens=self.avg_tokens
            )
        )
        postings = (
            chunks.filter(F.col("n_tokens") >= self.min_chunk_tokens)
            .select(
                F.xxhash64(F.col("chunk")).alias("_fp"),
                F.col(self.id_column).alias("_doc"),
            )
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(postings)
        counts = postings.groupBy("_fp").agg(
            F.count(F.lit(1)).alias("_n")
        )
        live = postings.join(
            counts.filter(
                (F.col("_n") >= 2) & (F.col("_n") <= self.max_chunk_docs)
            ),
            "_fp",
            "left_semi",
        )
        grp = live.groupBy("_fp").agg(F.collect_list("_doc").alias("docs"))
        pairs = grp.select(
            F.explode(_sorted_pairs(F.col("docs"), "id_a", "id_b"))
            .alias("p")
        ).select("p.id_a", "p.id_b")
        out = (
            pairs.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= self.min_shared)
        )
        tie_caches_to_result(out, self._persisted)
        return out


_CDC_KW = dict(avg_tokens=16, min_shared=2, min_chunk_tokens=5,
               max_chunk_docs=100)


def _arms(kind: str) -> dict:
    """Arm name -> fresh-operator factory. 'selfjoin' is the shipped
    form and the ratio denominator."""
    if kind == "minhash":
        return {
            "selfjoin": lambda: MinHashLSHPairs("doc_id", "text"),
            "packed": lambda: PackedMinHashLSHPairs("doc_id", "text"),
        }
    return {
        "selfjoin": lambda: cdc_chunk_neardup_pairs(
            "doc_id", "text", **_CDC_KW),
        "packed": lambda: PackedCdcChunkNeardupPairs(
            "doc_id", "text", **_CDC_KW),
        "hybrid": lambda: HybridCdcChunkNeardupPairs(
            "doc_id", "text", **_CDC_KW),
    }


def main() -> None:
    argv = list(sys.argv[1:])

    def opt(name, default):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    check_sf = opt("--check-sf", "/root/testdata/sf0.01")
    out_path = opt("--out", "/tmp/bucket_pack_probe.json")
    kinds = opt("--kinds", "minhash,cdc").split(",")
    arm_filter = opt("--arms", "")
    arm_filter = set(arm_filter.split(",")) if arm_filter else None
    reps = int(argv[0]) if argv else 3

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bucket-pack-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(check_sf, "documents.parquet"))

    result = {"metric": "bucket_pack_ab", "sf_dir": sf_dir,
              "check_sf": check_sf, "ops": {}}

    for kind in kinds:
        arms = _arms(kind)
        if arm_filter:
            arms = {n: f for n, f in arms.items()
                    if n == "selfjoin" or n in arm_filter}
        outs = {}
        for name, mk in arms.items():
            op = mk()
            outs[name] = sorted(map(tuple, docs.transform(op).collect()))
            op.release()
        base = outs["selfjoin"]
        for name, got in outs.items():
            assert got == base, (
                f"{kind}/{name}: output differs ({len(got)} vs {len(base)})")
        result["ops"][kind] = {"values_identical": True,
                               "n_pairs": len(base)}
        print(f"{kind}: equivalence OK ({len(base)} pairs, "
              f"{len(outs)} arms)", flush=True)

    big = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for kind in kinds:
        arms = _arms(kind)
        if arm_filter:
            arms = {n: f for n, f in arms.items()
                    if n == "selfjoin" or n in arm_filter}
        times = {name: [] for name in arms}
        for r in range(reps):
            for name, mk in arms.items():
                op = mk()
                spark.sparkContext.setJobDescription(
                    f"pack-ab {kind} {name} r{r}")
                df = big.transform(op)
                t0 = time.monotonic()
                df.write.format("noop").mode("overwrite").save()
                times[name].append(round(time.monotonic() - t0, 3))
                op.release()
        spark.sparkContext.setJobDescription(None)
        mins = {name: min(ts) for name, ts in times.items()}
        result["ops"][kind].update(
            reps=times,
            mins=mins,
            ratios_over_selfjoin={
                name: round(mins[name] / mins["selfjoin"], 3)
                for name in arms if name != "selfjoin"
            },
        )
        print(f"{kind}: {json.dumps(result['ops'][kind])}", flush=True)

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v.get("ratios_over_selfjoin")
                      for k, v in result["ops"].items()}))


if __name__ == "__main__":
    main()
