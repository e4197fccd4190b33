"""CLI (cli.main) — in-process with the shared session; one subprocess
smoke test for the real `python -m` entry."""

import json
import re

import pytest

from zeek_duckdb_spark.cli import main

REF = "/root/reference/data"


def test_query_view_tsv(spark, capsys):
    rc = main(
        [
            "query",
            "--view", f"kh={REF}/known_hosts_*.log.gz",
            "SELECT host_ip, sum(conns_opened) AS n FROM kh GROUP BY host_ip",
        ],
        spark=spark,
    )
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "host_ip\tn" and out[1] == "10.21.7.136\t43"


@pytest.mark.slow
def test_ingest_compact_export_round_trip(spark, tmp_path, capsys):
    land = str(tmp_path / "land")
    rc = main(
        ["ingest", f"{REF}/known_hosts_*.log.gz", land], spark=spark
    )
    assert rc == 0
    rc = main(["compact", land, "--partition-col", "p_date"], spark=spark)
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["files_after"] <= stats["files_before"]
    out = str(tmp_path / "zeek")
    rc = main(
        ["export", land, out, "--zeek-type", "host_ip=addr"], spark=spark
    )
    assert rc == 0
    from zeek_duckdb_spark import read_zeek

    back = read_zeek(spark, f"{out}/*.log")
    assert back.count() == spark.read.parquet(land).count() == 27


def test_check_gate_exit_code(spark, tmp_path, capsys):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "x"), (2, None)], "doc_id long, text string"
    ).write.parquet(d)
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([{"rule": "not_null", "col": "text"}]))
    assert main(["check", d, str(rules)], spark=spark) == 1
    rules.write_text(json.dumps([{"rule": "not_null", "col": "doc_id"}]))
    assert main(["check", d, str(rules)], spark=spark) == 0


def test_profile_over_parquet(spark, capsys):
    rc = main(
        ["profile", "/root/testdata/sf0.001/documents.parquet"], spark=spark
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out[0].startswith("n_docs\t") and len(out) == 2


@pytest.mark.slow
def test_python_dash_m_subprocess_smoke():
    import subprocess

    r = subprocess.run(
        [
            "python", "-m", "zeek_duckdb_spark", "query",
            "--view", f"kh={REF}/known_hosts_20260116_00*.log.gz",
            "SELECT count(*) AS n FROM kh",
        ],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().split("\n")[-1] == "1"


def test_limit_zero_and_bad_spec(spark, capsys):
    rc = main(
        ["query", "--parquet-view",
         "e=/root/testdata/sf0.001/events.parquet",
         "SELECT * FROM e", "--limit", "0"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert len(out) == 1  # header only, no unbounded collect
    with pytest.raises(SystemExit, match="NAME=GLOB"):
        main(["query", "--view", "noequals", "SELECT 1"], spark=spark)


def test_cli_clean_subcommand(spark, tmp_path):
    """The corpus-cleaning pipeline from the shell: parquet in ->
    cleaned parquet out + one JSON stats line; quality filter and
    exact dedup both fire."""
    import json as _json

    from zeek_duckdb_spark.cli import main

    src = str(tmp_path / "docs")
    out = str(tmp_path / "clean")
    spark.createDataFrame(
        [
            (1, "a genuinely useful document with plenty of real tokens"),
            (2, "a genuinely useful document with plenty of real tokens"),  # dup
            (3, "short"),                                                   # gated
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["clean", src, out, "--min-tokens", "3"], spark=spark)
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["rows_in"] == 3 and stats["rows_out"] == 1
    back = spark.read.parquet(out)
    assert {r.doc_id for r in back.collect()} == {1}
    assert "lang_guess" in back.columns


def test_cli_export_zst(spark, tmp_path):
    import os

    from zeek_duckdb_spark.cli import main

    src = str(tmp_path / "t")
    out = str(tmp_path / "logs")
    spark.createDataFrame([(1, "a"), (2, "b")], "n long, s string").write.parquet(src)
    rc = main(["export", src, out, "--compress", "zst"], spark=spark)
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".log.zst")]
    assert files
    from zeek_duckdb_spark import read_zeek

    back = read_zeek(spark, out + "/*.log.zst")
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


@pytest.mark.slow
def test_cli_clean_incremental_two_days(spark, tmp_path):
    """The daily-crawl loop from the shell: day 1 bootstraps the
    indexes and lands survivors; day 2's duplicate is dropped against
    them; dry-run reports without writing."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from zeek_duckdb_spark.cli import main

    day1_src = str(tmp_path / "day1")
    day2_src = str(tmp_path / "day2")
    out = str(tmp_path / "landing")
    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    spark.createDataFrame(
        [(1, "first unique document body here"),
         (2, "second unique document body here indeed")],
        "doc_id long, text string",
    ).write.parquet(day1_src)
    spark.createDataFrame(
        [(10, "first unique document body here"),   # dup of day 1
         (11, "a genuinely new day two document")],
        "doc_id long, text string",
    ).write.parquet(day2_src)

    def run(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(argv, spark=spark)
        assert rc == 0
        return _json.loads(buf.getvalue().strip().splitlines()[-1])

    s1 = run(["clean-incremental", day1_src, out, "--fps", fps, "--sigs", sigs])
    assert (s1["rows_in"], s1["rows_out"], s1["dry_run"]) == (2, 2, False)
    # landing id = basename + 8-hex path hash: readable daily key,
    # collision-proof across roots sharing a basename
    assert re.fullmatch(rf"{re.escape(out)}/batch=day1-[0-9a-f]{{8}}",
                        s1["out"])

    dry = run(["clean-incremental", day2_src, out, "--fps", fps,
               "--sigs", sigs, "--dry-run"])
    assert dry["rows_out"] == 1 and dry["dry_run"] is True

    s2 = run(["clean-incremental", day2_src, out, "--fps", fps, "--sigs", sigs])
    assert s2["rows_out"] == 1
    landed = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert landed == {1, 2, 11}
    # crash repair: rerunning the SAME batch overwrites its own
    # batch=day2 landing — no second copy of the survivors appears
    run(["clean-incremental", day2_src, out, "--fps", fps, "--sigs", sigs,
         "--allow-id-reruns"])
    again = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert sorted(again) == [1, 2, 11]
    # distinct input roots sharing a BASENAME must land in distinct
    # batch dirs — crawl-b/day2 must not overwrite crawl-a's day2
    other = tmp_path / "crawl-b" / "day2"
    other.parent.mkdir()
    spark.createDataFrame(
        [(20, "an unrelated crawl-b day two document")],
        "doc_id long, text string",
    ).write.parquet(str(other))
    s3 = run(["clean-incremental", str(other), out,
              "--fps", fps, "--sigs", sigs])
    assert s3["rows_out"] == 1 and s3["out"] != s2["out"]
    final = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert final == [1, 2, 11, 20]  # nothing replaced


def test_top_heavy_hitters(spark, tmp_path, capsys):
    d = str(tmp_path / "hits")
    spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)], "url string"
    ).write.parquet(d)
    rc = main(["top", d, "url", "-k", "3"], spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "url\tn"
    assert out[1:] == ["a\t5", "b\t3", "c\t3"]  # ties: key ascending
    rc = main(["top", d, "url", "-k", "1", "--approx"], spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "url\tn_lo\tn_hi"
    assert out[1].startswith("a\t")


def test_quantile_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "vals")
    spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    ).write.parquet(d)
    rc = main(["quantile", d, "x", "-q", "0.5", "-q", "0.99"], spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "q\tvalue"
    # quantile_disc over 1..100: rank ceil(0.5*100)=50 -> 50.0;
    # ceil(0.99*100)=99 -> 99.0
    assert out[1:] == ["0.5\t50.0", "0.99\t99.0"]


def test_quantile_subcommand_grouped(spark, tmp_path, capsys):
    d = str(tmp_path / "gvals")
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 100.0)]
    spark.createDataFrame(rows, "g string, x double").write.parquet(d)
    rc = main(["quantile", d, "x", "-q", "0.5", "--by", "g"], spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "g\tq\tvalue"
    assert sorted(out[1:]) == ["a\t0.5\t5.0", "b\t0.5\t100.0"]


def test_distinct_subcommand(spark, tmp_path, capsys):
    d = str(tmp_path / "dvals")
    spark.createDataFrame(
        [("a", i % 7) for i in range(50)] + [("b", i % 3) for i in range(30)],
        "g string, k int",
    ).write.parquet(d)
    rc = main(["distinct", d, "k", "--by", "g"], spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "g\tdistinct_est"
    assert sorted(out[1:]) == ["a\t7", "b\t3"]  # exact at tiny cardinality


def test_distinct_slice_catalog_land_and_merge(spark, tmp_path, capsys):
    """The slice-catalog loop: land one sketch table per day with
    --land, answer the union with ONE --merge over the glob — the
    merged estimates must equal exact countDistinct over the union
    (tiny cardinalities are exact in HLL)."""
    day1 = str(tmp_path / "day1")
    day2 = str(tmp_path / "day2")
    spark.createDataFrame(
        [("a", i % 7) for i in range(50)] + [("b", i % 3) for i in range(30)],
        "g string, k int",
    ).write.parquet(day1)
    # day 2 overlaps day 1 (k 0..6 for a) and adds new keys
    spark.createDataFrame(
        [("a", i % 11) for i in range(40)] + [("b", 100 + i % 2) for i in range(10)],
        "g string, k int",
    ).write.parquet(day2)
    land = tmp_path / "sketches"
    land.mkdir()
    for day, src in (("d1", day1), ("d2", day2)):
        rc = main(["distinct", src, "k", "--by", "g",
                   "--land", str(land / day)], spark=spark)
        assert rc == 0
        assert json.loads(capsys.readouterr().out.strip())["landed"]
    rc = main(["distinct", str(land / "*"), "--by", "g", "--merge"],
              spark=spark)
    out = capsys.readouterr().out.strip().split("\n")
    assert rc == 0
    assert out[0] == "g\tdistinct_est"
    # exact union cardinalities: a: {0..10} = 11, b: {0,1,2,100,101} = 5
    assert sorted(out[1:]) == ["a\t11", "b\t5"]
    # guards: no match, and column required without --merge
    with pytest.raises(SystemExit, match="no sketch dirs"):
        main(["distinct", str(tmp_path / "nope*"), "--merge"], spark=spark)
    with pytest.raises(SystemExit, match="column is required"):
        main(["distinct", day1], spark=spark)


@pytest.mark.slow
def test_score_fit_gate_loop(spark, tmp_path, capsys):
    """The classifier loop from a shell: fit on a labeled sample
    (landing the model JSON), score the corpus, gate at a threshold —
    rerunning from the landed model (no --fit) gives identical rows."""
    import numpy as np

    rng = np.random.default_rng(2)
    DIM = 8
    w_true = rng.normal(0, 1, DIM)
    X = rng.normal(0, 1, (200, DIM))
    y = (X @ w_true > 0).astype(int)
    X = X + 0.9 * np.sign(X @ w_true)[:, None] * w_true / np.linalg.norm(w_true)
    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        [(i, [float(v) for v in X[i]], int(y[i])) for i in range(200)],
        "vec_id long, embedding array<double>, label int",
    ).write.parquet(labeled)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1000 + i, [float(v) for v in X[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    ).write.parquet(corpus)
    model = str(tmp_path / "model.json")
    out1 = str(tmp_path / "kept")
    rc = main(["score", corpus, out1, "--fit", labeled, "--dim", "8",
               "--model", model, "--iters", "25", "--lr", "2.0",
               "--threshold", "0.5"], spark=spark)
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["fitted"] and rep["gated"] and 0 < rep["rows_out"] < 200
    # kept rows should be overwhelmingly the true-positive class
    kept = {r.vec_id - 1000 for r in spark.read.parquet(out1).collect()}
    acc = sum(1 for i in kept if y[i] == 1) / len(kept)
    assert acc >= 0.9
    # serve from the landed model, no refit: same gate survivors
    out2 = str(tmp_path / "kept2")
    rc = main(["score", corpus, out2, "--model", model,
               "--threshold", "0.5"], spark=spark)
    assert rc == 0
    again = {r.vec_id - 1000 for r in spark.read.parquet(out2).collect()}
    assert again == kept
    # ungated scoring lands every row with its score column
    out3 = str(tmp_path / "scored")
    rc = main(["score", corpus, out3, "--model", model], spark=spark)
    assert rc == 0
    scored = spark.read.parquet(out3)
    assert scored.count() == 200 and "quality_score" in scored.columns
    with pytest.raises(SystemExit, match="--dim"):
        main(["score", corpus, out3, "--fit", labeled], spark=spark)
    with pytest.raises(SystemExit, match="--fit or --model"):
        main(["score", corpus, out3], spark=spark)


def test_split_subcommand(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"domain{i % 23}.example") for i in range(400)],
        "doc_id long, domain string",
    ).write.parquet(src)
    out = str(tmp_path / "splits")
    rc = main(["split", src, out, "--key", "domain",
               "--frac", "train=0.7", "--frac", "test=0.3"], spark=spark)
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["counts"]) == {"train", "test"}
    assert sum(rep["counts"].values()) == 400
    back = spark.read.parquet(out)
    # group key integrity: no domain straddles splits
    from pyspark.sql import functions as F

    per = back.groupBy("domain").agg(
        F.count_distinct("split").alias("n")).collect()
    assert all(r.n == 1 for r in per)


def test_batch_id_contract():
    """The landing-id contract (no Spark needed): same path string ->
    same id; same-basename roots differ; trailing slashes ignored; URI
    schemes survive un-mangled; cwd never enters the hash."""
    from zeek_duckdb_spark.cli import _batch_id

    a = _batch_id("/data/crawl-a/2026-08-14")
    b = _batch_id("/data/crawl-b/2026-08-14")
    assert a != b
    assert a.startswith("2026-08-14-") and b.startswith("2026-08-14-")
    assert _batch_id("/data/crawl-a/2026-08-14/") == a
    assert _batch_id("/data/crawl-a/2026-08-14") == a  # pure function
    # URI schemes: the double slash must not collapse into the id hash
    s3 = _batch_id("s3://bucket/crawl/2026-08-14")
    assert s3.startswith("2026-08-14-") and s3 != a
    assert _batch_id("s3://bucket/crawl/2026-08-14/") == s3
    # a relative path hashes the STRING, independent of cwd
    import os

    cwd = os.getcwd()
    try:
        r1 = _batch_id("crawl/2026-08-14")
        os.chdir("/tmp")
        r2 = _batch_id("crawl/2026-08-14")
    finally:
        os.chdir(cwd)
    assert r1 == r2
    assert _batch_id("/") == "root-" + _batch_id("/").rsplit("-", 1)[-1]


@pytest.mark.slow
def test_cli_clean_incremental_legacy_landing_guard(spark, tmp_path):
    """Advice-fix regression: a pre-hash batch=<basename> landing
    (older id scheme) next to this input's new-id landing is surfaced
    as an error — a rerun would otherwise land a SECOND full copy of
    the batch and silently duplicate rows for readers of the root.
    --legacy-ok proceeds when the operator asserts the legacy dir
    belongs to a different root that merely shares the basename."""
    import io
    import os
    from contextlib import redirect_stdout

    src = str(tmp_path / "day9")
    out = str(tmp_path / "landing")
    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    spark.createDataFrame(
        [(1, "a fresh day nine document body")],
        "doc_id long, text string",
    ).write.parquet(src)
    os.makedirs(os.path.join(out, "batch=day9"))  # older build's landing
    with pytest.raises(SystemExit, match="legacy landing"):
        main(["clean-incremental", src, out, "--fps", fps, "--sigs", sigs],
             spark=spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["clean-incremental", src, out, "--fps", fps,
                   "--sigs", sigs, "--legacy-ok"], spark=spark)
    assert rc == 0
    assert json.loads(buf.getvalue().strip().splitlines()[-1])["rows_out"] == 1


@pytest.mark.slow
def test_score_token_features_loop(spark, tmp_path, capsys):
    """The fastText-style TOKEN classifier loop from a shell
    (--features tokens): fit on labeled text, gate the corpus, serve
    again from the landed model; a features-mismatched serve fails
    loudly instead of scoring garbage."""
    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        [(i, "research analysis data method result study", 1)
         for i in range(40)]
        + [(100 + i, "buy cheap pills casino bonus click offer", 0)
           for i in range(40)],
        "doc_id long, text string, label int",
    ).write.parquet(labeled)
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "the research method data shows a result"),
         (2, "buy cheap pills casino click bonus now"),
         (3, "study evidence analysis of the method")],
        "doc_id long, text string",
    ).write.parquet(corpus)
    model = str(tmp_path / "tok_model.json")
    out1 = str(tmp_path / "kept")
    rc = main(["score", corpus, out1, "--fit", labeled,
               "--features", "tokens", "--dim", "128", "--model", model,
               "--iters", "10", "--lr", "2.0", "--threshold", "0.5"],
              spark=spark)
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["fitted"] and rep["gated"]
    kept = {r.doc_id for r in spark.read.parquet(out1).collect()}
    assert kept == {1, 3}
    assert json.load(open(model))["features"] == "tokens"
    # serve from the landed model without refit: same survivors
    out2 = str(tmp_path / "kept2")
    rc = main(["score", corpus, out2, "--model", model,
               "--features", "tokens", "--threshold", "0.5"], spark=spark)
    assert rc == 0
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {1, 3}
    # ungated scoring keeps all rows + the score column
    out3 = str(tmp_path / "scored")
    rc = main(["score", corpus, out3, "--model", model,
               "--features", "tokens"], spark=spark)
    assert rc == 0
    sc = spark.read.parquet(out3)
    assert sc.count() == 3 and "quality_score" in sc.columns
    # a token model served through the embedding path must refuse
    with pytest.raises(SystemExit, match="--features"):
        main(["score", corpus, out3, "--model", model], spark=spark)


@pytest.mark.slow
def test_clean_with_classifier_model(spark, tmp_path, capsys):
    """The full shell loop: fit the token classifier (score --fit
    --features tokens), then clean --classifier-model gates the corpus
    by learned quality alongside the heuristic filters; an embedding
    model is refused (the gate runs over text)."""
    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        [(i, "research analysis data method result study", 1)
         for i in range(40)]
        + [(100 + i, "buy cheap pills casino bonus click offer", 0)
           for i in range(40)],
        "doc_id long, text string, label int",
    ).write.parquet(labeled)
    model = str(tmp_path / "tok.json")
    dummy_out = str(tmp_path / "dummy")
    rc = main(["score", labeled, dummy_out, "--fit", labeled,
               "--features", "tokens", "--dim", "128", "--model", model,
               "--iters", "10", "--lr", "2.0"], spark=spark)
    assert rc == 0
    capsys.readouterr()

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "the research method data shows a result here"),
         (2, "buy cheap pills casino click bonus now today"),
         (3, "study evidence analysis of the method and data")],
        "doc_id long, text string",
    ).write.parquet(corpus)
    out = str(tmp_path / "cleaned")
    rc = main(["clean", corpus, out, "--min-tokens", "3",
               "--classifier-model", model], spark=spark)
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows_in"] == 3 and rep["rows_out"] == 2
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3}

    # an embedding-features model must be refused
    emb_model = str(tmp_path / "emb.json")
    json.dump({"weights": [0.1] * 8, "bias": 0.0,
               "features": "embedding"}, open(emb_model, "w"))
    with pytest.raises(SystemExit, match="TOKEN model"):
        main(["clean", corpus, out, "--classifier-model", emb_model],
             spark=spark)


@pytest.mark.slow
def test_clean_incremental_classifier_gate_and_legacy_model_refusal(
    spark, tmp_path, capsys
):
    """clean-incremental applies the token gate from the shell (junk
    never reaches the landing or the sig index), and BOTH clean
    commands refuse a legacy no-'features' model JSON (those are
    embedding models — applying them as hashed-token weights would
    silently gate on garbage)."""
    import io
    from contextlib import redirect_stdout

    labeled = str(tmp_path / "labeled")
    spark.createDataFrame(
        [(i, "research analysis data method result study", 1)
         for i in range(40)]
        + [(100 + i, "buy cheap pills casino bonus click offer", 0)
           for i in range(40)],
        "doc_id long, text string, label int",
    ).write.parquet(labeled)
    model = str(tmp_path / "tok.json")
    rc = main(["score", labeled, str(tmp_path / "d"), "--fit", labeled,
               "--features", "tokens", "--dim", "128", "--model", model,
               "--iters", "10", "--lr", "2.0"], spark=spark)
    assert rc == 0
    capsys.readouterr()

    batch = str(tmp_path / "day1")
    spark.createDataFrame(
        [(1, "the research method data shows a result here"),
         (2, "buy cheap pills casino click bonus now today")],
        "doc_id long, text string",
    ).write.parquet(batch)
    out = str(tmp_path / "landing")
    fps, sigs = str(tmp_path / "fps"), str(tmp_path / "sigs")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["clean-incremental", batch, out, "--fps", fps,
                   "--sigs", sigs, "--classifier-model", model],
                  spark=spark)
    assert rc == 0
    assert json.loads(buf.getvalue().strip().splitlines()[-1])["rows_out"] == 1
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}
    assert [r.doc_id for r in spark.read.parquet(sigs).select("doc_id").collect()] == [1]

    legacy = str(tmp_path / "legacy.json")
    json.dump({"weights": [0.1] * 8, "bias": 0.0}, open(legacy, "w"))
    with pytest.raises(SystemExit, match="TOKEN model"):
        main(["clean", batch, str(tmp_path / "x"),
              "--classifier-model", legacy], spark=spark)
    with pytest.raises(SystemExit, match="TOKEN model"):
        main(["clean-incremental", batch, out, "--fps", fps, "--sigs",
              sigs, "--classifier-model", legacy], spark=spark)
    with pytest.raises(SystemExit, match="threshold"):
        main(["clean", batch, str(tmp_path / "x"),
              "--classifier-model", model,
              "--classifier-threshold", "1.5"], spark=spark)


def test_compact_nested_partition_cols(spark, tmp_path, capsys):
    """CLI compact with a comma-separated --partition-col drives the
    r11 multi-level layout path (the banded/chunked index shape)."""
    import os

    from zeek_duckdb_spark.operators import dedup as dd

    path = str(tmp_path / "bandidx")
    for day in range(3):
        docs = spark.createDataFrame(
            [(day * 10 + i, " ".join(f"d{day}i{i}w{j}" for j in range(10)))
             for i in range(6)],
            "doc_id long, text string",
        )
        sigs = dd.minhash_signatures(docs, num_hashes=32, shingle_k=3)
        dd.write_band_index(sigs, path, bands=4, num_hashes=32, pfx_mod=2)
    before = spark.read.parquet(path).count()
    rc = main(
        ["compact", path, "--partition-col", "band,pfx"], spark=spark
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["files_after"] < stats["files_before"]
    assert spark.read.parquet(path).count() == before
    dirs = {
        os.path.relpath(r, path)
        for r, _d, names in os.walk(path)
        if any(n.endswith(".parquet") for n in names)
    }
    assert all(d.startswith("band=") and "pfx=" in d for d in dirs)


@pytest.mark.slow
def test_ingest_crawl_subcommand(spark, tmp_path):
    """WARC glob -> extracted-text parquet landing from the command
    line: only 200/html responses land by default, script junk is
    gone, the doc_id is deterministic across re-lands."""
    from zeek_duckdb_spark.sources.warc import encode_warc

    body = b"<html><body><script>x()</script><p>crawl  page text</p></body></html>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
    png = b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\nContent-Length: 3\r\n\r\nabc"
    miss = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\nContent-Length: 4\r\n\r\ngone"
    # legal uppercase Content-Type (real crawls carry Text/HTML) —
    # the default page filter must not drop it (round-13)
    upper_body = b"<p>uppercase content type page words</p>"
    upper = (
        b"HTTP/1.1 200 OK\r\nContent-Type: Text/HTML\r\n"
        b"Content-Length: %d\r\n\r\n" % len(upper_body) + upper_body
    )
    (tmp_path / "c.warc.gz").write_bytes(encode_warc([
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:1>",
          "WARC-Target-URI": "http://a.org/p", "WARC-Date": "2026-08-16T00:00:00Z",
          "Content-Type": "application/http; msgtype=response"}, http),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:2>",
          "WARC-Target-URI": "http://a.org/i.png",
          "Content-Type": "application/http; msgtype=response"}, png),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:3>",
          "WARC-Target-URI": "http://a.org/gone",
          "Content-Type": "application/http; msgtype=response"}, miss),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:4>",
          "WARC-Target-URI": "http://a.org/upper",
          "Content-Type": "application/http; msgtype=response"}, upper),
    ]))
    out = str(tmp_path / "landed")
    rc = main(["ingest-crawl", str(tmp_path / "*.warc.gz"), out], spark=spark)
    assert rc == 0
    rows = {r.url: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"http://a.org/p", "http://a.org/upper"}
    r = rows["http://a.org/p"]
    assert r.text == "crawl page text"
    assert rows["http://a.org/upper"].text == "uppercase content type page words"
    first_id = r.doc_id
    # re-land: deterministic doc_id, overwrite semantics
    assert main(["ingest-crawl", str(tmp_path / "*.warc.gz"), out],
                spark=spark) == 0
    relanded = {r.url: r.doc_id for r in spark.read.parquet(out).collect()}
    assert relanded["http://a.org/p"] == first_id
    # --all-responses keeps the png and the 404 rows too
    rc = main(["ingest-crawl", str(tmp_path / "*.warc.gz"), out,
               "--all-responses"], spark=spark)
    assert rc == 0
    assert spark.read.parquet(out).count() == 4


@pytest.mark.slow
def test_index_crawl_subcommand(spark, tmp_path):
    """index-crawl: WARC glob -> sorted CDX parquet from the command
    line (urlkey order; --all-types widens past responses)."""
    from zeek_duckdb_spark.sources.warc import encode_warc

    body = b"<p>x</p>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body)) + body
    (tmp_path / "c.warc.gz").write_bytes(encode_warc([
        ({"WARC-Type": "warcinfo"}, b"software: t\r\n"),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:1>",
          "WARC-Target-URI": "https://www.B.org/x",
          "WARC-Date": "2026-08-16T00:00:00Z",
          "Content-Type": "application/http; msgtype=response"}, http),
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:2>",
          "WARC-Target-URI": "https://a.org/y",
          "WARC-Date": "2026-08-16T00:00:01Z",
          "Content-Type": "application/http; msgtype=response"}, http),
    ]))
    out = str(tmp_path / "cdx")
    assert main(["index-crawl", str(tmp_path / "*.warc.gz"), out],
                spark=spark) == 0
    rows = spark.read.parquet(out).collect()
    assert [r.urlkey for r in rows] == ["org,a)/y", "org,b)/x"]  # sorted
    assert all(r.http_status == 200 for r in rows)
    assert main(["index-crawl", str(tmp_path / "*.warc.gz"), out,
                 "--all-types", "--no-sort"], spark=spark) == 0
    assert spark.read.parquet(out).count() == 3

    # r14: --partitioned lands the write_cdx pruned layout, --digest
    # switches the hashing convention
    pout = str(tmp_path / "cdxp")
    assert main(["index-crawl", str(tmp_path / "*.warc.gz"), pout,
                 "--partitioned", "--digest", "stored"],
                spark=spark) == 0
    from zeek_duckdb_spark.sources.warc import read_cdx

    back = read_cdx(spark, pout)
    assert back.count() == 2 and "pfx" not in back.columns
    assert read_cdx(spark, pout, "org,a)").count() == 1

    # conflicting flags error instead of silently ignoring --no-sort
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="conflicts with"):
        main(["index-crawl", str(tmp_path / "*.warc.gz"), pout,
              "--partitioned", "--no-sort"], spark=spark)

    # compact --sort-cols keeps the landing's within-file order —
    # pinned by reading the rewritten parquet directly, not a count
    import glob as _glob

    import pyarrow.parquet as _pq

    assert main(["compact", pout, "--partition-col", "pfx",
                 "--sort-cols", "urlkey,cdx_ts"], spark=spark) == 0
    assert read_cdx(spark, pout, "org,a)").count() == 1
    for pf in _glob.glob(f"{pout}/pfx=*/*.parquet"):
        keys = _pq.read_table(pf, columns=["urlkey"]).column(0).to_pylist()
        assert keys == sorted(keys), pf
    with _pytest.raises(SystemExit, match="no columns"):
        main(["compact", pout, "--partition-col", "pfx",
              "--sort-cols", ","], spark=spark)


def test_export_wet_subcommand(spark, tmp_path):
    """export-wet: a landed text corpus (the ingest-crawl output
    shape) exports as WET shards read_warc reads back; a corpus
    without a date column still exports (WARC-Date is optional)."""
    from zeek_duckdb_spark.sources.warc import read_warc

    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "https://c.org/a", "text one"), (2, "https://c.org/b", "two")],
        "doc_id long, url string, text string",   # no warc_date col
    ).write.parquet(src)
    out = str(tmp_path / "wet")
    rc = main(["export-wet", src, out, "--shards", "1"], spark=spark)
    assert rc == 0
    back = read_warc(spark, f"{out}/part-*.warc.gz",
                     record_types=("conversion",), decode_text=True)
    got = {r.target_uri: r.body_text for r in back.collect()}
    assert got == {"https://c.org/a": "text one", "https://c.org/b": "two"}


def test_export_wat_subcommand(spark, tmp_path):
    """export-wat: WARC files -> WAT metadata shards in one command;
    the envelope carries the HTTP headers and harvested links, and
    --no-links keeps the plan Python-free."""
    import json as _json

    from zeek_duckdb_spark.sources.warc import encode_warc, read_warc

    html = b'<html><a href="http://t.org/z">z</a></html>'
    arc = tmp_path / "c.warc.gz"
    arc.write_bytes(encode_warc([({
        "WARC-Type": "response",
        "WARC-Record-ID": "<urn:uuid:w1>",
        "WARC-Target-URI": "http://t.org/p",
        "WARC-Date": "2026-08-16T00:00:00Z",
        "Content-Type": "application/http; msgtype=response",
    }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
       b"Content-Length: %d\r\n\r\n" % len(html) + html)]))
    out = str(tmp_path / "wat")
    rc = main(["export-wat", str(arc), out, "--shards", "1"], spark=spark)
    assert rc == 0
    back = read_warc(spark, f"{out}/part-*.warc.gz",
                     record_types=("metadata",), headers=True).collect()
    assert len(back) == 1
    assert back[0].warc_headers["warc-refers-to"] == "<urn:uuid:w1>"
    env = _json.loads(bytes(back[0].body).decode())["Envelope"]
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert hm["Headers"]["content-type"] == "text/html"
    assert hm["HTML-Metadata"]["Links"] == [
        {"path": "A@/href", "url": "http://t.org/z"}]
    out2 = str(tmp_path / "wat2")
    assert main(["export-wat", str(arc), out2, "--no-links"],
                spark=spark) == 0
    back2 = read_warc(spark, f"{out2}/part-*.warc.gz",
                      record_types=("metadata",)).collect()
    env2 = _json.loads(bytes(back2[0].body).decode())["Envelope"]
    assert "HTML-Metadata" not in env2["Payload-Metadata"][
        "HTTP-Response-Metadata"]


@pytest.mark.slow
def test_dedup_archive_subcommand(spark, tmp_path):
    """dedup-archive: duplicate payloads re-land as revisit records;
    the output resolves back to the full corpus."""
    from zeek_duckdb_spark.sources.warc import (
        cdx_records,
        encode_warc,
        read_warc_selected,
        resolve_revisits,
    )

    ent = b"<html>dup</html>"
    def _r(rid, uri, date):
        return ({"WARC-Type": "response", "WARC-Record-ID": rid,
                 "WARC-Target-URI": uri, "WARC-Date": date,
                 "Content-Type": "application/http; msgtype=response"},
                b"HTTP/1.1 200 OK\r\nContent-Length: %d\r\n\r\n"
                % len(ent) + ent)
    arc = tmp_path / "d.warc.gz"
    arc.write_bytes(encode_warc([
        _r("<urn:uuid:1>", "http://a/", "2026-01-01T00:00:00Z"),
        _r("<urn:uuid:2>", "http://a/", "2026-02-01T00:00:00Z"),
    ]))
    out = str(tmp_path / "dd")
    rc = main(["dedup-archive", str(arc), out, "--shards", "1",
               "--compress", "zst"], spark=spark)
    assert rc == 0
    idx = cdx_records(spark, f"{out}/part-*.warc.zst",
                      record_types=("response", "revisit"),
                      digest="stored")
    got = read_warc_selected(spark, resolve_revisits(idx)).collect()
    assert len(got) == 1 and bytes(got[0].body) == ent
    assert idx.count() == 2


def test_ingest_crawl_charset_and_link_density(spark, tmp_path):
    """ingest-crawl decodes per the page's declared charset and
    --max-link-density drops navigation boilerplate."""
    from zeek_duckdb_spark.sources.warc import encode_warc

    body = ('<nav><a href="/">Home</a><a href="/a">About</a></nav>'
            "<p>artículo útil with plain words here</p>").encode("latin-1")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )
    (tmp_path / "c.warc.gz").write_bytes(encode_warc([
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:c>",
          "WARC-Target-URI": "http://l.org/p",
          "Content-Type": "application/http; msgtype=response"}, http),
    ]))
    out = str(tmp_path / "landed")
    rc = main(["ingest-crawl", str(tmp_path / "*.warc.gz"), out,
               "--max-link-density", "0.5"], spark=spark)
    assert rc == 0
    r = spark.read.parquet(out).collect()[0]
    assert r.text == "artículo útil with plain words here"
