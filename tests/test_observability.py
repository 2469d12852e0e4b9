"""Logging surface: the reference writes every executed pipeline to a dated
logfile (reference utils/logger.py + backend/api.py "Executing ..." lines);
the engine must reproduce that contract when LOG_DIR is set and stay
side-effect-free (no logs/ directory creation) when it is not."""

from __future__ import annotations

import logging
import os

import pytest

from hybrid_vector_search_spark import observability as obs


@pytest.fixture(autouse=True)
def clean_loggers(monkeypatch):
    obs.reset_loggers()
    yield
    obs.reset_loggers()


def test_console_only_without_log_dir(monkeypatch, tmp_path):
    monkeypatch.delenv("LOG_DIR", raising=False)
    monkeypatch.chdir(tmp_path)
    logger = obs.get_logger("t1")
    logger.info("hello")
    # importing/logging must not create a logs/ dir as a side effect
    assert not (tmp_path / "logs").exists()
    assert not any(isinstance(h, logging.FileHandler) for h in logger.handlers)


def test_dated_file_handler_with_log_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    logger = obs.get_logger("t2")
    logger.info("pipeline ran")
    files = list((tmp_path / "logs").glob("log-*.log"))
    assert len(files) == 1
    text = files[0].read_text()
    # the reference's format: "<asctime> [LEVEL] message"
    assert "[INFO] pipeline ran" in text


def test_loggers_are_cached_and_share_the_file_handler(monkeypatch, tmp_path):
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    a, b = obs.get_logger("a"), obs.get_logger("b")
    assert obs.get_logger("a") is a
    fa = [h for h in a.handlers if isinstance(h, logging.FileHandler)]
    fb = [h for h in b.handlers if isinstance(h, logging.FileHandler)]
    assert fa and fb and fa[0] is fb[0]


def test_timed_logs_duration_and_reraises(monkeypatch, tmp_path):
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    logger = obs.get_logger("t3")
    with obs.timed(logger, "ok-block"):
        pass
    with pytest.raises(ValueError):
        with obs.timed(logger, "bad-block"):
            raise ValueError("boom")
    text = next((tmp_path / "logs").glob("log-*.log")).read_text()
    assert "ok-block completed in" in text
    assert "bad-block failed after" in text and "boom" in text


def test_search_logs_pipeline_lines(monkeypatch, tmp_path, spark):
    """SearchEngine.search must log the mode pipeline + wall time the way
    the reference's api logger does (backend/api.py:202)."""
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    obs.reset_loggers()
    # rebuild api._LOG against the tmp LOG_DIR
    from hybrid_vector_search_spark import api as api_mod

    monkeypatch.setattr(api_mod, "_LOG", obs.get_logger("api-test"))

    from hybrid_vector_search_spark.api import SearchConfig, SearchEngine
    from hybrid_vector_search_spark.operators.embed import embed_documents
    from hybrid_vector_search_spark.sources import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").limit(200)
    corpus = embed_documents(docs, "text", "emb")
    cfg = SearchConfig(id_col="doc_id", title_col="text", emb_col="emb")
    engine = SearchEngine(corpus, cfg)
    engine.search({"mode": "vector", "description": "spark table", "limit": 2})
    text = next((tmp_path / "logs").glob("log-*.log")).read_text()
    assert "Executing vector pipeline" in text
    assert "search[vector] completed in" in text


def test_plan_string_shows_physical_plan(spark):
    df = spark.range(10).where("id > 3").select("id")
    plan = obs.plan_string(df)
    assert "Range" in plan  # the scan node Catalyst chose


def test_file_handler_rolls_at_emit_when_date_changes(monkeypatch, tmp_path):
    """Cached loggers must roll to the new day's file at EMIT time — the
    handler created at import must not pin the startup date forever."""
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    logger = obs.get_logger("roll")
    logger.info("day one")
    handler = next(h for h in logger.handlers if isinstance(h, logging.FileHandler))
    # simulate a process that started yesterday: rewind the handler's date
    handler._date = "2000-01-01"
    handler.baseFilename = handler._path()
    logger.info("day two")
    files = sorted(p.name for p in (tmp_path / "logs").glob("log-*.log"))
    assert len(files) == 1  # rolled back to TODAY's file, not the stale date
    assert "day two" in next((tmp_path / "logs").glob("log-*.log")).read_text()
