"""Shared fixtures: one local SparkSession per test run + gazetteers."""

from __future__ import annotations

from pathlib import Path

import pytest

from islamic_ner_spark.sources.gazetteer import Gazetteer

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def spark():
    from islamic_ner_spark.session import build_session

    session = build_session(
        "islamic_ner_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def matcher_gazetteer() -> Gazetteer:
    """The reference's matcher test fixtures (tests/fixtures/gazetteers)."""
    return Gazetteer.from_dir(FIXTURES / "gazetteers")


@pytest.fixture(scope="session")
def resolver_gazetteer() -> Gazetteer:
    """The reference's resolver fixtures (tests/fixtures/resolver_gazetteers)."""
    return Gazetteer.from_dir(FIXTURES / "resolver_gazetteers")
