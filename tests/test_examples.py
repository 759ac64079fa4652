"""The examples are documentation that executes — run both end-to-end
at fixture scale inside the suite's session so they cannot rot.
(get_spark getOrCreate's into the active test session, so these add
pipeline time, not JVM startup time.)
"""

from __future__ import annotations

import sys


def test_corpus_pipeline_example_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    from examples import corpus_pipeline

    monkeypatch.setattr(
        sys, "argv", ["corpus_pipeline.py", sf_dir, str(tmp_path / "out")]
    )
    corpus_pipeline.main()
    out = capsys.readouterr().out
    assert "corpus:" in out and "blocks" in out
    assert (tmp_path / "out" / "blocks").is_dir()


def test_crawl_ledgers_example_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    from examples import crawl_ledgers

    monkeypatch.setattr(
        sys, "argv", ["crawl_ledgers.py", sf_dir, str(tmp_path / "state")]
    )
    crawl_ledgers.main()  # the example asserts incremental == one-shot itself
    out = capsys.readouterr().out
    assert "incremental == one-shot asserted" in out
    assert (tmp_path / "state" / "vocab").is_dir()


def test_cdc_pipeline_example_runs(spark, tmp_path, monkeypatch, capsys):
    import sys

    from examples import cdc_pipeline

    monkeypatch.setattr(
        sys, "argv", ["cdc_pipeline.py", str(tmp_path / "work")]
    )
    cdc_pipeline.main()  # asserts time travel, warehouse parity, vacuum itself
    out = capsys.readouterr().out
    assert "relay drove 3 window(s)" in out and "== silver" in out


def test_dsir_selection_example_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    from examples import dsir_selection

    monkeypatch.setattr(
        sys, "argv", ["dsir_selection.py", sf_dir, str(tmp_path / "work")]
    )
    dsir_selection.main()  # asserts enrichment + bit-exact ledger itself
    out = capsys.readouterr().out
    assert "incremental model == one-shot asserted" in out
    assert "frozen-threshold keep:" in out


def test_trainer_artifacts_example_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    from examples import trainer_artifacts

    monkeypatch.setattr(trainer_artifacts, "SF_DIR", sf_dir)
    trainer_artifacts.main(str(tmp_path / "work"))
    out = capsys.readouterr().out
    assert "worker assembled train/00:" in out
    assert "attention-mask" in out
    assert "manifest == reader censuses after erase" in out
