"""End-to-end training-data curation job (jobs/run_curation.py):
exact dedup → fuzzy dedup → decontamination → quality/lang filters →
split → packing, with a stage-accounted manifest."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import jobs.run_curation as job

WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and",
    "runs", "fast", "into", "green", "field", "with", "many", "other",
    "animals", "while", "sun", "shines", "bright", "today",
]


@pytest.fixture(scope="module")
def curation_docs(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(50):
        rows.append((i, " ".join(rng.choice(WORDS, size=50))))
    # exact duplicate of doc 3
    rows.append((300, rows[3][1]))
    # near-duplicate of doc 4 (one token changed)
    toks = rows[4][1].split()
    toks[25] = "MUTANT"
    rows.append((301, " ".join(toks)))
    # a junk doc that fails the quality length band
    rows.append((302, "x"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    d = tmp_path_factory.mktemp("curation")
    docs = str(d / "docs.parquet")
    spark.createDataFrame(pdf).write.parquet(docs)
    # benchmark containing doc 7's text → doc 7 is contaminated
    bench = str(d / "bench.parquet")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [pdf.iloc[7]["text"]]})
    ).write.parquet(bench)
    return {"dir": str(d), "docs": docs, "bench": bench, "pdf": pdf}


def test_curation_end_to_end(spark, curation_docs, tmp_path):
    out = str(tmp_path / "curated")
    mpath = str(tmp_path / "manifest.json")
    rc = job.main(
        [
            "--documents", curation_docs["docs"],
            "--output", out,
            "--benchmark", curation_docs["bench"],
            "--min-quality", "0.5",
            "--langs", "en",
            "--split-weights", "train=0.9", "val=0.05", "test=0.05",
            "--pack-budget", "128",
            "--manifest", mpath,
        ]
    )
    assert rc == 0
    m = json.load(open(mpath))
    got = spark.read.parquet(out).toPandas()
    kept = set(got["doc_id"])

    # exact dup 300 (copy of 3) gone, canonical 3 kept
    assert 3 in kept and 300 not in kept
    # near-dup 301 (of 4) gone via fuzzy dedup, canonical 4 kept
    assert 4 in kept and 301 not in kept
    # contaminated doc 7 gone
    assert 7 not in kept
    # junk doc 302 fails quality
    assert 302 not in kept

    # manifest accounting: stages chain and counts telescope
    names = [s["stage"] for s in m["stages"]]
    assert names == [
        "exact_dedup", "fuzzy_dedup", "decontamination", "quality_filter",
        "lang_filter", "split_assign", "packing", "sink",
    ]
    assert all("wall_seconds" in s for s in m["stages"])
    # per-stage executor attribution (core-seconds / shuffle / spill):
    # present on every stage, and the expensive stages actually burned
    # executor time (the N->4N inflation falsifier, VERDICT r6 ask #3)
    assert all("executor" in s for s in m["stages"])
    assert all(
        set(s["executor"])
        >= {"core_seconds", "cpu_seconds", "shuffle_read_mb", "spill_mb"}
        for s in m["stages"]
    )
    assert m["stages"][1]["executor"]["core_seconds"] > 0  # fuzzy dedup
    for prev, nxt in zip(m["stages"], m["stages"][1:]):
        assert nxt["rows_in"] == prev["rows_out"]
    assert m["stages"][0]["rows_in"] == m["rows_in"] == 53
    assert m["rows_out"] == len(got)
    # fuzzy stage surfaced its LSH audit (no silent caps) and the CC
    # driver-sync telemetry (rounds == Spark jobs, the scale-relevant
    # serial cost of group formation)
    fz = m["stages"][1]
    assert "lsh_audit" in fz and "n_buckets" in fz["lsh_audit"]
    assert fz["cc_audit"]["cc_rounds"] >= 1
    assert fz["cc_audit"]["cc_nodes"] >= 1
    # lang filter surfaced the per-language prediction histogram (rides
    # the scoring pass as observe() metrics) and it telescopes
    lf = m["stages"][4]
    assert lf["stage"] == "lang_filter"
    hist = lf["lang_histogram"]
    assert sum(hist.values()) == lf["rows_in"]
    assert hist["en"] == lf["rows_out"]

    # curation artifacts present: split label + packing offsets
    assert set(got["split"]) <= {"train", "val", "test"}
    for c in ("n_tokens", "start_tok", "pack_id", "pack_offset", "shard"):
        assert c in got.columns
    # packing offsets are consistent within each shard
    for _, g in got.sort_values(["shard", "doc_id"]).groupby("shard"):
        expect = g["n_tokens"].cumsum().shift(fill_value=0)
        assert (g["start_tok"].to_numpy() == expect.to_numpy()).all()


def test_curation_stages_optional(spark, curation_docs, tmp_path):
    """With every optional stage off, the job is exact-dedup only."""
    out = str(tmp_path / "curated_min")
    rc = job.main(
        ["--documents", curation_docs["docs"], "--output", out,
         "--skip-fuzzy-dedup"]
    )
    assert rc == 0
    got = spark.read.parquet(out).toPandas()
    assert 300 not in set(got["doc_id"])  # exact dup still removed
    assert 301 in set(got["doc_id"])      # near dup kept (fuzzy off)
    assert list(got.columns) == ["doc_id", "text"]


def test_curation_embedding_near_dup_stage(spark, curation_docs, tmp_path):
    """--embeddings removes embedding-cosine near-duplicates (canonical
    min-id kept) and records the stage + its LSH audit in the manifest."""
    rng = np.random.default_rng(23)
    pdf = curation_docs["pdf"]
    ids = pdf["doc_id"].tolist()
    vecs = {i: rng.standard_normal(16) for i in ids}
    # docs 10 and 11 get near-identical embeddings (cos ~ 1)
    vecs[11] = vecs[10] + rng.standard_normal(16) * 1e-3
    emb = pd.DataFrame(
        {"doc_id": ids, "embedding": [list(map(float, vecs[i])) for i in ids]}
    )
    epath = str(tmp_path / "emb.parquet")
    spark.createDataFrame(emb).write.parquet(epath)

    out = str(tmp_path / "curated_emb")
    mpath = str(tmp_path / "m_emb.json")
    rc = job.main(
        ["--documents", curation_docs["docs"], "--output", out,
         "--skip-fuzzy-dedup", "--embeddings", epath,
         "--manifest", mpath]
    )
    assert rc == 0
    got = spark.read.parquet(out).toPandas()
    kept = set(got["doc_id"])
    assert 10 in kept and 11 not in kept  # embedding near-dup removed
    m = json.load(open(mpath))
    st = {s["stage"]: s for s in m["stages"]}
    assert "embedding_near_dup" in st
    assert st["embedding_near_dup"]["dropped"] >= 1
    assert "lsh_audit" in st["embedding_near_dup"]

def test_curation_embedding_vec_col_resolution(spark, curation_docs, tmp_path):
    """ADVICE r4: an embeddings table with extra metadata columns must not
    silently feed the wrong column into near-dup detection — ambiguous
    layouts fail loudly, --embedding-vec-col selects explicitly, and a
    non-array selection is rejected."""
    import pytest

    rng = np.random.default_rng(29)
    pdf = curation_docs["pdf"]
    ids = pdf["doc_id"].tolist()
    emb = pd.DataFrame(
        {
            "doc_id": ids,
            # metadata column FIRST — the old first-non-id-column
            # inference would have picked this one
            "source": ["web"] * len(ids),
            "vec": [list(map(float, rng.standard_normal(8))) for _ in ids],
        }
    )
    epath = str(tmp_path / "emb_meta.parquet")
    spark.createDataFrame(emb).write.parquet(epath)
    out = str(tmp_path / "curated_vc")

    base = ["--documents", curation_docs["docs"], "--output", out,
            "--skip-fuzzy-dedup", "--embeddings", epath]
    # ambiguous (two non-id columns, none named 'embedding') → loud fail
    with pytest.raises(SystemExit, match="ambiguous"):
        job.main(base)
    # explicit non-array column → loud fail
    with pytest.raises(SystemExit, match="expected"):
        job.main(base + ["--embedding-vec-col", "source", "--overwrite"])
    # explicit array column → runs, and the manifest records the choice
    mpath = str(tmp_path / "m_vc.json")
    rc = job.main(base + ["--embedding-vec-col", "vec", "--overwrite",
                          "--manifest", mpath])
    assert rc == 0
    m = json.load(open(mpath))
    st = {s["stage"]: s for s in m["stages"]}
    assert st["embedding_near_dup"]["vec_col"] == "vec"


def test_curation_as_of_snapshot_pins_corpus(spark, tmp_path):
    """TIME TRAVEL through the curation CLI: curating a checkpointed
    corpus at snapshot N-1 after a later bucket group landed must see
    only the rows visible at that version and record the pinned version
    in the run manifest (reproducible curation over a moving table)."""
    import json as _json

    import jobs.run_curation as job
    from nuclei_feature_extraction_spark.sources.checkpoint import (
        CheckpointedWriter,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:03d}" for i in range(40)],
            "text": [
                f"unique document number {i} with several plain words "
                f"about rivers and mountains {i}" for i in range(40)
            ],
        }
    )
    src = str(tmp_path / "ckpt_docs")
    w = CheckpointedWriter(src, n_buckets=4, buckets_per_job=2,
                           key_col="doc_id")
    w.run(spark.createDataFrame(pdf))
    hist = w.snapshots()
    assert [s["version"] for s in hist] == [1, 2]
    v1_rows = hist[0]["rows"]
    assert 0 < v1_rows < len(pdf)

    mpath = str(tmp_path / "m.json")
    rc = job.main(
        ["--documents", src, "--as-of-snapshot", "1",
         "--output", str(tmp_path / "curated"),
         "--skip-fuzzy-dedup", "--manifest", mpath, "--overwrite"]
    )
    assert rc == 0
    m = _json.load(open(mpath))
    assert m["rows_in"] == v1_rows
    assert m["rows_out"] == v1_rows  # all docs unique + no filters
    assert m["input_snapshot"]["version"] == 1
    assert m["input_snapshot"]["history"] == hist
