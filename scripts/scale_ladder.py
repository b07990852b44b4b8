"""Scale-ladder measurement: candidate-pair volume and recall for the
LSH banding paths, across a 16× synthetic corpus ladder — turning the
sub-quadratic claims in ``operators/similarity.py:auto_banding`` and
``operators/dedup.py:minhash_lsh_candidates`` from argument into data.

Corpora are synthesized DETERMINISTICALLY in-engine (md5-derived
uniforms — same trick as the hyperplane signs), matching the fixture's
distribution families: 64-dim embeddings, 10-100-token docs over a
31-word vocabulary. Every 50th item gets a planted near-duplicate so
recall is measurable against the exact baseline at the sizes where the
O(n²) baseline is still runnable.

Run: ``python scripts/scale_ladder.py`` (~3-5 min on local[32]);
paste the table into SCALE.md's scale-ladder section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIM = 64
VOCAB = [f"w{i}" for i in range(31)]


def synth_embeddings(spark: SparkSession, n: int, plant_every: int = 50) -> DataFrame:
    """n deterministic 64-dim vectors, uniform per-dim in [-1, 1]
    (md5(id:dim) → uniform), plus a planted near-dup (same vector, one
    dim nudged +0.05) for every ``plant_every``-th id — the positives
    the recall measurement needs."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            f"(cast(conv(substr(md5(concat(id, ':', d)), 1, 8), 16, 10) as double)"
            f" / 4294967295.0) * 2 - 1)"
        ).alias("embedding"),
    )
    dups = (
        base.filter(F.col("vec_id") % plant_every == 0)
        .select(
            (F.col("vec_id") + n).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, d) -> CASE WHEN d = 0 THEN x + 0.05 ELSE x END)"
            ).alias("embedding"),
        )
    )
    return base.unionAll(dups)


def synth_documents(spark: SparkSession, n: int, plant_every: int = 50) -> DataFrame:
    """n deterministic docs of 10-100 tokens over the 31-word vocabulary
    (matching the fixture's shape), plus a near-dup (same text + one
    extra token) for every ``plant_every``-th doc."""
    vocab_lit = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, "
            f"10 + cast(cast(conv(substr(md5(concat('L', id)), 1, 8), 16, 10) as bigint) % 91 as int)), "
            f"j -> element_at({vocab_lit}, 1 + cast(cast(conv(substr(md5(concat(id, '#', j)), 1, 8), 16, 10) as bigint) % 31 as int))))"
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % plant_every == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.lit("w0")).alias("text"),
    )
    return base.unionAll(dups)


def main() -> None:
    from c_tran_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from c_tran_data_pipeline_spark.operators.similarity import (
        auto_banding,
        embedding_lsh_candidates,
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-ladder")
    out: dict[str, list[dict]] = {"embedding_lsh": [], "minhash": []}

    # ---- embedding LSH: candidate volume, fixed vs auto banding -------
    for n in (2_000, 4_000, 8_000, 16_000, 32_000):
        emb = synth_embeddings(spark, n).persist()
        n_total = emb.count()
        row: dict = {"n": n_total}

        planes_a, tables_a = auto_banding(n_total)
        t0 = time.perf_counter()
        row["auto_candidates"] = embedding_lsh_candidates(
            emb, planes=planes_a, tables=tables_a, dim=DIM
        ).count()
        row["auto_sec"] = round(time.perf_counter() - t0, 2)
        row["auto_banding"] = [planes_a, tables_a]

        if n <= 8_000:  # fixed 3×12 banding goes quadratic — cap the measurement
            t0 = time.perf_counter()
            row["fixed_candidates"] = embedding_lsh_candidates(
                emb, planes=3, tables=12, dim=DIM
            ).count()
            row["fixed_sec"] = round(time.perf_counter() - t0, 2)

        if n <= 4_000:  # exact baseline for recall (O(n²), opt-in)
            exact = {
                (r["d1"], r["d2"])
                for r in embedding_neardup_pairs(
                    emb, threshold=0.9, baseline_cap=None
                ).collect()
            }
            got = {
                (r["d1"], r["d2"])
                for r in embedding_neardup_pairs_lsh(
                    emb, threshold=0.9, planes=planes_a, tables=tables_a, dim=DIM
                ).collect()
            }
            row["n_true_pairs"] = len(exact)
            row["recall"] = round(len(exact & got) / max(len(exact), 1), 4)
        out["embedding_lsh"].append(row)
        emb.unpersist()
        print(json.dumps(row), flush=True)

    # ---- MinHash banding: candidate volume across the doc ladder ------
    for n in (5_000, 10_000, 20_000, 40_000):
        docs = synth_documents(spark, n).persist()
        n_total = docs.count()
        t0 = time.perf_counter()
        cands = minhash_lsh_candidates(docs, num_hashes=16, bands=4).count()
        row = {
            "n": n_total,
            "candidates": cands,
            "sec": round(time.perf_counter() - t0, 2),
        }
        out["minhash"].append(row)
        docs.unpersist()
        print(json.dumps(row), flush=True)

    print(json.dumps(out))


def ann_ladder() -> None:
    """IVF-PQ build/search scaling (run: ``python scripts/scale_ladder.py
    --ann``): build the persisted index at each corpus size (nlist
    scaled so cells stay probe-prunable) and time warm searches — the
    measurement behind SCALE.md's "amortized search stays flat" claim.
    """
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.operators.pq import (
        deterministic_sample,
        ivfpq_index,
        ivfpq_search,
        read_ivfpq_index,
        write_ivfpq_index,
    )
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("ann-ladder")
    tmp = Path(tempfile.mkdtemp(prefix="ann_ladder_"))
    try:
        for n, nlist in ((8_000, 32), (32_000, 64), (128_000, 128)):
            emb = synth_embeddings(spark, n).persist()
            emb.count()
            queries = emb.filter(F.col("vec_id") < 20)
            t0 = time.perf_counter()
            # Canonical recipe: both quantizers train on the 1/4
            # deterministic hash-sample (train-on-sample, assign-full-
            # corpus); the r3 ladder trained on the full corpus.
            idx = ivfpq_index(
                emb,
                m=8,
                ksub=16,
                nlist=nlist,
                iters=2,
                dim=64,
                train_df=deterministic_sample(emb, mod=4, key="vec_id"),
            )
            path = str(tmp / f"idx_{n}")
            write_ivfpq_index(idx, path)
            build_s = time.perf_counter() - t0
            disk = read_ivfpq_index(spark, path)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                ivfpq_search(disk, queries, k=3, nprobe=4, rerank_factor=8).collect()
                times.append(time.perf_counter() - t0)
            # Candidate volume: rows the ADC leg actually scores = Σ over
            # (query, probed cell) of cell size — the quantity the IVF
            # pruning bounds to ~|queries|·nprobe·(n/nlist) regardless of
            # corpus size at fixed cell occupancy.
            from c_tran_data_pipeline_spark.operators.similarity import (
                _as_double,
                _probe_cells,
            )

            cents, _, encoded = disk
            probes = queries.select(
                F.col("vec_id").alias("query_id"),
                F.explode(
                    _probe_cells(_as_double(F.col("embedding")), cents, 4)
                ).alias("centroid_id"),
            )
            cand = encoded.join(probes, "centroid_id").count()
            emb.unpersist()
            print(
                json.dumps(
                    {
                        "n": n,
                        "nlist": nlist,
                        "build_s": round(build_s, 2),
                        "search_s": [round(x, 2) for x in sorted(times)],
                        "candidates": cand,
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_EN_VOCAB = (
    "the and of to in for with on at by from this that is are was were be "
    "have has had not but they them their there here when where what which "
    "who how all some many most other into over under"
).split()  # 40 common English words so lang_id passes and quality is real


def synth_english_documents(spark: SparkSession, n: int, plant_every: int = 50) -> DataFrame:
    """Like synth_documents but over an English stopword vocabulary (so
    the corpus-prep language filter keeps the docs) and with a source
    column (37 synthetic domains) for the domain-cap stage."""
    vocab_lit = "array(" + ",".join(f"'{w}'" for w in _EN_VOCAB) + ")"
    nv = len(_EN_VOCAB)
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 37).cast("string")).alias("source"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, "
            f"10 + cast(cast(conv(substr(md5(concat('L', id)), 1, 8), 16, 10) as bigint) % 91 as int)), "
            f"j -> element_at({vocab_lit}, 1 + cast(cast(conv(substr(md5(concat(id, '#', j)), 1, 8), 16, 10) as bigint) % {nv} as int))))"
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % plant_every == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        "source",
        F.concat_ws(" ", F.col("text"), F.lit("the")).alias("text"),
    )
    return base.unionAll(dups)


def prep_ladder() -> None:
    """END-TO-END corpus-prep scaling (run: ``python scripts/scale_ladder.py
    --prep``): the full q_corpus_prep_neardup pipeline — langid + quality
    scoring, exact dedup, MinHash-LSH near-dup candidates, star-contraction
    connected components, domain cap — timed over a 16× synthetic English
    corpus ladder. The claim under test: the whole pipeline is equi-join/
    agg-shaped, so wall-clock grows ~linearly with the corpus (no hidden
    quadratic stage)."""
    from c_tran_data_pipeline_spark.functions.text import lang_id, quality_score
    from c_tran_data_pipeline_spark.operators.curation import domain_cap, exact_dedup
    from c_tran_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from c_tran_data_pipeline_spark.operators.graph import dedup_clusters
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("prep-ladder")
    for n in (5_000, 20_000, 80_000):
        docs = synth_english_documents(spark, n).persist()
        n_total = docs.count()
        t0 = time.perf_counter()
        scored = docs.select(
            "doc_id", "source", "text",
            lang_id("text").alias("pred_lang"),
            quality_score("text").alias("quality"),
        )
        kept = scored.filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.2))
        exact = exact_dedup(kept, content="text", key="doc_id").localCheckpoint(eager=False)
        pairs = minhash_lsh_candidates(exact, num_hashes=16, bands=4)
        comp = dedup_clusters(pairs)
        survivors = (
            exact.join(comp, on="doc_id", how="left")
            .filter(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
            .drop("component")
        )
        capped = domain_cap(
            survivors, domain="source",
            order_by=[F.col("quality").desc(), F.col("doc_id").asc()], cap=1000,
        )
        n_out = capped.count()
        row = {
            "n_docs": n_total,
            "survivors": n_out,
            "sec": round(time.perf_counter() - t0, 2),
        }
        docs.unpersist()
        print(json.dumps(row), flush=True)


def pagerank_ladder() -> None:
    """Iterative-fixpoint scaling (run: ``python scripts/scale_ladder.py
    --pagerank``): operators/graph.py pagerank over a 16x deterministic
    edge ladder with a SKEWED (Zipf-ish) degree distribution — each
    edge i attaches src=h(i) mod sqrt-range (hubby) to dst=i mod n
    (uniform), symmetrized. The claim under test: per-iteration cost is
    one |E| contribution shuffle + a |V| agg, so wall-clock grows
    ~linearly in |E| at fixed iteration count (3, matching q_pagerank),
    hub skew notwithstanding (AQE handles the hot reducer)."""
    from c_tran_data_pipeline_spark.operators.graph import pagerank
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("pagerank-ladder")
    for n_edges in (25_000, 100_000, 400_000):
        hub_range = int(n_edges ** 0.5)
        e0 = spark.range(n_edges).select(
            F.expr(
                f"cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10) as bigint)"
                f" % {hub_range}"
            ).cast("string").alias("src"),
            F.expr(f"cast(id % {n_edges // 4} as string)").alias("dst"),
        ).filter(F.col("src") != F.col("dst")).distinct()
        edges = e0.union(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().persist()
        n_e = edges.count()
        t0 = time.perf_counter()
        pr = pagerank(edges, iters=3, damping=0.85, teleport=0.15)
        n_v = pr.count()
        mass = pr.agg(F.sum("rank")).collect()[0][0]
        row = {
            "edges": n_e,
            "nodes": n_v,
            "mass": round(mass, 9),
            "sec": round(time.perf_counter() - t0, 2),
        }
        edges.unpersist()
        print(json.dumps(row), flush=True)


def graph_ladder() -> None:
    """Triangle-counting scaling (run: ``python scripts/scale_ladder.py
    --graph``): operators/graph.py triangles over a 16× deterministic
    edge ladder with heavy hubs (both endpoints drawn as
    ⌊n·u^2.5⌋ from md5-uniforms — mass concentrates at low ids, max
    degree ≈ thousands). Two claims under test: (1) the degree-ordered
    orientation caps the oriented out-degree far below the raw hub
    degree (hub edges point INTO the hub), so (2) the wedge-join volume
    — Σ C(outdeg, 2), the whole cost of the algorithm — stays near-
    linear in |E| instead of blowing up Σ C(deg, 2) at the hubs."""
    from c_tran_data_pipeline_spark.operators.graph import triangles
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("graph-ladder")

    def _u(salt: str) -> str:
        return (
            f"(cast(conv(substr(md5(concat(id, ':{salt}')), 1, 8), 16, 10) as double)"
            f" / 4294967295.0)"
        )

    for m in (50_000, 200_000, 800_000):
        n = m // 10  # avg degree ~20; hubs far denser via the ^2.5 skew
        e = (
            spark.range(m)
            .select(
                F.expr(f"cast(floor({n} * pow({_u('a')}, 2.5)) as bigint)").alias("u"),
                F.expr(f"cast(floor({n} * pow({_u('b')}, 2.5)) as bigint)").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .distinct()
            .persist()
        )
        n_e = e.count()
        # raw vs oriented degree stats (replicates triangles()'s
        # orientation so the hub-bound claim is measured, not asserted)
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        ok = deg.select("node", (F.col("deg") * F.lit(1_000_000_000) + F.col("node")).alias("okey"))
        eo = (
            e.join(ok.select(F.col("node").alias("a"), F.col("okey").alias("ka")), "a")
            .join(ok.select(F.col("node").alias("b"), F.col("okey").alias("kb")), "b")
            .select(F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"))
        )
        odeg = eo.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
        stats = deg.agg(F.max("deg")).collect()[0][0], odeg.agg(
            F.max("od"), F.sum(F.col("od") * (F.col("od") - 1) / 2)
        ).collect()[0]
        t0 = time.perf_counter()
        tri = triangles(e)
        total3 = tri.agg(F.sum("n_triangles")).collect()[0][0] or 0
        row = {
            "edges": n_e,
            "max_deg": stats[0],
            "max_oriented_outdeg": stats[1][0],
            "wedges": int(stats[1][1]),
            "triangles": total3 // 3,
            "sec": round(time.perf_counter() - t0, 2),
        }
        e.unpersist()
        print(json.dumps(row), flush=True)


def lpa_ladder() -> None:
    """Label-propagation scaling (run: ``python scripts/scale_ladder.py
    --lpa``): operators/graph.py label_propagation (2 iterations, the
    q_label_prop configuration) over the same skewed 16× edge ladder as
    the pagerank rung. Claim under test: each iteration is one |2E|
    join+shuffle plus a per-node window — categorical state, so cost is
    linear in |E| at fixed iterations, hub skew notwithstanding."""
    from c_tran_data_pipeline_spark.operators.graph import label_propagation
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("lpa-ladder")
    for n_edges in (25_000, 100_000, 400_000):
        hub_range = int(n_edges**0.5)
        e = (
            spark.range(n_edges)
            .select(
                F.expr(
                    f"cast(conv(substr(md5(cast(id as string)), 1, 8), 16, 10) as bigint)"
                    f" % {hub_range}"
                ).alias("a"),
                (F.col("id") % (n_edges // 4) + hub_range).alias("b"),
            )
            .distinct()
            .persist()
        )
        n_e = e.count()
        t0 = time.perf_counter()
        lab = label_propagation(e, iters=2)
        n_v = lab.count()
        n_comm = lab.select("community").distinct().count()
        row = {
            "edges": n_e,
            "nodes": n_v,
            "communities": n_comm,
            "sec": round(time.perf_counter() - t0, 2),
        }
        e.unpersist()
        print(json.dumps(row), flush=True)


def skyline_ladder() -> None:
    """Skyline scaling (run: ``python scripts/scale_ladder.py
    --skyline``): operators/skyline.py skyline_2d over a 16× ladder of
    CORRELATED points (y = x + noise — the realistic price/quality
    shape; anticorrelated worst-case exactness is pinned in pytest).
    Claims under test: (1) the grid prune's sweep input grows with the
    bucket count + frontier, NOT the input (measured as `survivors`),
    so (2) wall-clock stays near-flat while points grow 16×."""
    from c_tran_data_pipeline_spark.operators.skyline import skyline_2d
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("skyline-ladder")

    def _u(salt: str) -> str:
        return (
            f"(cast(conv(substr(md5(concat(id, ':{salt}')), 1, 8), 16, 10) as double)"
            f" / 4294967295.0)"
        )

    for n in (250_000, 1_000_000, 4_000_000):
        pts = spark.range(n).select(
            F.expr(f"{_u('x')} * 1000000.0").alias("x"),
            F.expr(f"{_u('x')} * 1000000.0 + {_u('y')} * 1000.0").alias("y"),
        ).persist()
        pts.count()
        # survivors of the prune stage (rebuilt, as in the pytest pin)
        b = pts.distinct().withColumn("__b", F.floor(F.col("x") / F.lit(1000.0)))
        wb = Window.orderBy(F.desc("__b")).rowsBetween(Window.unboundedPreceding, -1)
        brun = b.groupBy("__b").agg(F.max("y").alias("m")).select(
            "__b", F.max("m").over(wb).alias("hi")
        )
        survivors = (
            b.join(F.broadcast(brun), "__b")
            .filter(F.col("hi").isNull() | (F.col("hi") < F.col("y")))
            .count()
        )
        t0 = time.perf_counter()
        sky = skyline_2d(pts, "x", "y", bucket_width=1000.0)
        n_sky = sky.count()
        row = {
            "points": n,
            "survivors": survivors,
            "frontier": n_sky,
            "sec": round(time.perf_counter() - t0, 2),
        }
        pts.unpersist()
        print(json.dumps(row), flush=True)


def ppjoin_ladder() -> None:
    """Prefix-filter join scaling (run: ``python scripts/scale_ladder.py
    --ppjoin``): operators/dedup.py prefix_filter_jaccard_pairs vs the
    full inverted-index join (ngram_jaccard_pairs) over a 16× ZIPFIAN
    doc ladder — the fixture vocabulary is uniform, which hides the
    point: on real (skewed) text the full join pays Σ df² where df is
    LARGEST, the prefix join only where df is smallest. Claims under
    test: (1) prefix candidate volume ≪ full-index pair volume, with
    the gap WIDENING as the corpus grows (hot-token df² grows
    quadratically, rare-token prefix df² near-linearly); (2) identical
    result pairs (the filter is lossless); (3) wall-clock follows the
    candidate volume."""
    from c_tran_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
        shingle_index,
    )
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("ppjoin-ladder")
    V, S = 200, 1.1
    w = [1.0 / (r + 1) ** S for r in range(V)]
    tot = sum(w)
    acc, cum = 0.0, []
    for x in w:
        acc += x
        cum.append(acc / tot)
    cum_lit = "array(" + ",".join(repr(c) for c in cum) + ")"

    def zipf_docs(n: int) -> DataFrame:
        base = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(1, 10 + cast(cast(conv("
                f"substr(md5(concat('L', id)), 1, 8), 16, 10) as bigint) % 31 as int)), "
                f"j -> concat('w', cardinality(filter({cum_lit}, t -> t < "
                f"(cast(conv(substr(md5(concat(id, '#', j)), 1, 8), 16, 10) as double)"
                f" / 4294967295.0))))))"
            ).alias("text"),
        )
        dups = base.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit("w0")).alias("text"),
        )
        return base.unionAll(dups)

    for n in (2_000, 8_000, 32_000):
        docs = zipf_docs(n).persist()
        docs.count()
        idx = shingle_index(docs)
        full_pairs = (
            idx.alias("a")
            .join(idx.alias("b"), "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        full = {
            (r.d1, r.d2)
            for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
        }
        sec_full = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pf = {
            (r.d1, r.d2)
            for r in prefix_filter_jaccard_pairs(docs).collect()
        }
        sec_prefix = round(time.perf_counter() - t0, 2)
        # candidate volume of the prefix stage, rebuilt standalone
        sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        dfreq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        wnd = Window.partitionBy("doc_id").orderBy("df", "shingle")
        pre = (
            idx.join(dfreq, "shingle")
            .withColumn("rn", F.row_number().over(wnd))
            .join(sizes, "doc_id")
            .filter(F.col("rn") <= F.col("n") - F.expr("(4 * n + 4) DIV 5") + 1)
        )
        cands = (
            pre.alias("a")
            .join(pre.alias("b"), "shingle")
            .filter(
                (F.col("a.doc_id") < F.col("b.doc_id"))
                & (5 * F.least("a.n", "b.n") >= 4 * F.greatest("a.n", "b.n"))
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        assert pf == full, f"prefix filter lost pairs at n={n}"
        row = {
            "docs": n + n // 25 + 1,
            "full_index_pairs": full_pairs,
            "prefix_candidates": cands,
            "result_pairs": len(pf),
            "sec_full": sec_full,
            "sec_prefix": sec_prefix,
        }
        docs.unpersist()
        print(json.dumps(row), flush=True)


def ivfpq_sf_ladder() -> None:
    """Persisted-index search at sf-fixture scale (run: ``python
    scripts/scale_ladder.py --ivfpq-sf``): measures the REGISTERED
    q_ann_ivfpq_search / q_ann_ivf_search dataflows (shared committed
    index, literal probed-cell PartitionFilters, fixed production
    recipe nlist=16/nprobe=4) against the real sf0.1 embeddings
    fixture and sf1/sf10-sized corpora derived from it (each vector
    replicated 10x/100x with deterministic per-replica hash noise, so
    the distribution and cell occupancy scale honestly; the 20-query
    batch stays fixed — replicas get vec_id >= 1e6, out of the
    vec_id < 20 query predicate). Records per-rung: cold build time,
    3 warm search timings per flavor, and the ADC candidate volume
    (sum of probed cell sizes over the query batch). With nlist FIXED
    at the registered recipe, candidates grow ~linearly in the corpus
    (cells fatten) — the --ann ladder is the nlist-scaled counterpart
    that holds per-cell occupancy flat; this rung-set shows what the
    fixed recipe costs at 10x/100x the fixture, which is the honest
    version of the 'flat-ish per query' claim."""
    import shutil
    from pathlib import Path

    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.operators.similarity import _as_double, _probe_cells
    from c_tran_data_pipeline_spark.plans import similarity_queries as sq
    from c_tran_data_pipeline_spark.session import get_spark
    from c_tran_data_pipeline_spark.sources.readers import load_table

    spark = get_spark("ivfpq-sf-ladder")
    base = "/root/testdata/sf0.1"
    root = Path("/tmp/spark_graft_sf_ladder")
    shutil.rmtree(root, ignore_errors=True)

    def replicate(factor: int, dest: Path) -> str:
        emb = load_table(spark, base, "embeddings")
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        noisy = (
            emb.crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") + F.col("rep") * F.lit(1_000_000)).alias("vec_id"),
                F.when(F.col("rep") == 0, F.col("embedding"))
                .otherwise(
                    F.expr(
                        "transform(embedding, (x, i) -> CAST(x + "
                        "(pmod(hash(vec_id, rep, i), 1000) / 1000.0 - 0.5) * 0.05"
                        " AS FLOAT))"
                    )
                )
                .alias("embedding"),
                F.col("label"),
            )
        )
        dest.mkdir(parents=True, exist_ok=True)
        noisy.write.mode("overwrite").parquet(str(dest / "embeddings.parquet"))
        return str(dest)

    rungs = [("sf0.1", base)]
    rungs.append(("sf1", replicate(10, root / "sf1")))
    rungs.append(("sf10", replicate(100, root / "sf10")))

    for tag, sf_dir in rungs:
        n = load_table(spark, sf_dir, "embeddings").count()
        t0 = time.perf_counter()
        path = sq._build_ivfpq(spark, sf_dir)
        build_s = round(time.perf_counter() - t0, 2)
        ivfpq_s, ivf_s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            sq.q_ann_ivfpq_search(spark, sf_dir).collect()
            ivfpq_s.append(round(time.perf_counter() - t0, 2))
            t0 = time.perf_counter()
            sq.q_ann_ivf_search(spark, sf_dir).collect()
            ivf_s.append(round(time.perf_counter() - t0, 2))
        cents, _, encoded = sq._ensure_ivfpq(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings")
        probes = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"),
            F.explode(_probe_cells(_as_double(F.col("embedding")), cents, 4)).alias(
                "centroid_id"
            ),
        )
        cand = encoded.join(probes, "centroid_id").count()
        print(
            json.dumps(
                {
                    "rung": tag,
                    "n_vectors": n,
                    "build_s": build_s,
                    "ivfpq_search_s": sorted(ivfpq_s),
                    "ivf_search_s": sorted(ivf_s),
                    "adc_candidates": cand,
                }
            ),
            flush=True,
        )



if __name__ == "__main__":
    if "--ivfpq-sf" in sys.argv:
        ivfpq_sf_ladder()
    elif "--ann" in sys.argv:
        ann_ladder()
    elif "--prep" in sys.argv:
        prep_ladder()
    elif "--pagerank" in sys.argv:
        pagerank_ladder()
    elif "--graph" in sys.argv:
        graph_ladder()
    elif "--lpa" in sys.argv:
        lpa_ladder()
    elif "--ppjoin" in sys.argv:
        ppjoin_ladder()
    elif "--skyline" in sys.argv:
        skyline_ladder()
    else:
        main()
