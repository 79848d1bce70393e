"""jobs/evalcmp.py: the extraction-quality comparison report CLI —
drive build_report end-to-end on tmp parquet and pin the family-level
agreements (self-comparison is perfect everywhere; a damaged candidate
degrades every metric; coverage counts expose id mismatch)."""

import argparse
import json
import subprocess
import sys

import pytest


def _args(ref, cand, group="source", out=None):
    return argparse.Namespace(
        ref=str(ref), cand=str(cand), id_col="doc_id", text_col="text",
        group_col=group, out=out,
    )


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("evalcmp")
    rows = [
        (0, "s0", "the quick brown fox jumps over the lazy dog today"),
        (1, "s0", "pack my box with five dozen liquor jugs right now"),
        (2, "s1", "how vexingly quick daft zebras jump around the park"),
        (3, "s1", "sphinx of black quartz judge my vow once more again"),
    ]
    ref = base / "ref.parquet"
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(str(ref))
    # candidate: doc 3 missing, doc 1 truncated, doc 2 has subword damage
    cand_rows = [
        (0, rows[0][2]),
        (1, "pack my box with five"),
        (2, rows[2][2].replace("zebras", "zebrxs")),
    ]
    cand = base / "cand.parquet"
    spark.createDataFrame(
        cand_rows, "doc_id long, text string"
    ).write.parquet(str(cand))
    return ref, cand


def test_self_comparison_is_perfect(spark, corpora):
    from jobs.evalcmp import build_report

    ref, _ = corpora
    rep = build_report(spark, _args(ref, ref))
    assert rep["n_scored_pairs"] == rep["n_ref"] == 4
    for src in ("s0", "s1"):
        assert rep["token_prf"][src]["micro_f1"] == 1.0
        assert rep["rouge2"][src]["micro_f1"] == 1.0
        assert rep["bleu"][src]["bleu"] == 1.0 and rep["bleu"][src]["bp"] == 1.0
        assert rep["chrf"][src]["chrf"] == 1.0


def test_damaged_candidate_localizes(spark, corpora):
    from jobs.evalcmp import build_report

    ref, cand = corpora
    rep = build_report(spark, _args(ref, cand))
    # coverage: doc 3 has no candidate row -> 3 scored pairs, counts honest
    assert (rep["n_ref"], rep["n_cand"], rep["n_scored_pairs"]) == (4, 3, 3)
    # s0 holds the truncation: BLEU brevity penalty < 1 fires there
    assert rep["bleu"]["s0"]["bp"] < 1.0
    # s1 holds the subword damage: token f1 drops harder than chrf
    assert rep["token_prf"]["s1"]["micro_f1"] < rep["chrf"]["s1"]["chrf"]
    # nothing is perfect anymore, but everything is scored
    for src in ("s0", "s1"):
        assert 0.0 < rep["bleu"][src]["bleu"] <= 1.0
        assert 0.0 < rep["chrf"][src]["chrf"] < 1.0


def test_ungrouped_overall_rollup(spark, corpora):
    from jobs.evalcmp import build_report

    ref, cand = corpora
    rep = build_report(spark, _args(ref, cand, group=None))
    assert set(rep["token_prf"]) == {"_overall"}
    assert rep["group_col"] is None
    assert rep["chrf"]["_overall"]["chrf"] > 0


def test_cli_prints_one_json_line(corpora, tmp_path):
    ref, cand = corpora
    out = tmp_path / "report.json"
    env = {"SPARK_GRAFT_CPUS": "4"}
    import os

    env = {**os.environ, **env}
    r = subprocess.run(
        [sys.executable, "jobs/evalcmp.py", "--ref", str(ref),
         "--cand", str(cand), "--out", str(out)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep == json.loads(out.read_text())
    assert rep["n_scored_pairs"] == 3
