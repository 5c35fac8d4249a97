"""Shared fixtures: one SparkSession per test session, fixture graphs."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session", autouse=True)
def _clean_sem_scratch():
    """Tests run sem kernels against unique tmp_path layouts; each one
    publishes compiled blocks under the per-user scratch root that no
    later run can ever address again (the layout hash never recurs).
    Remove the dirs this test session created so suites don't leak."""
    import shutil

    def _snapshot() -> set[str]:
        from linkgraph.algos.pagerank import _sem_disk_root

        try:
            root = _sem_disk_root()
            return {os.path.join(root, n) for n in os.listdir(root)}
        except OSError:
            return set()

    before = _snapshot()
    yield
    for d in _snapshot() - before:
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def spark():
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="linkgraph-tests",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def wiki_edges() -> np.ndarray:
    from linkgraph.synth import wiki_vote_like_edges

    return wiki_vote_like_edges()


@pytest.fixture(scope="session")
def wiki_edges_df(spark, wiki_edges):
    from linkgraph.synth import edges_df

    return edges_df(spark, wiki_edges).cache()


@pytest.fixture(scope="session")
def wiki_vertices_df(spark):
    from linkgraph.synth import WIKI_VOTE_N

    return spark.range(WIKI_VOTE_N).selectExpr("id")


def golden(name: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(FIXTURES, f"golden_{name}.csv"))
