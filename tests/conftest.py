import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from kg.session import build_session

    s = build_session(
        app_name="kg-tests", master="local[4]", shuffle_partitions=8
    )
    yield s


@pytest.fixture(scope="session")
def clean_pages(spark):
    """100 clean fixture pages, cached once for the whole session."""
    from kg import fixtures as FX

    df = FX.gen_pages(spark, 100, seed=42, noise=0.0).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def clean_result(spark, clean_pages, tmp_path_factory):
    """One checkpointed pipeline run shared by parity/resume tests."""
    from kg import fixtures as FX
    from kg.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("kgckpt"))
    res = run_pipeline(
        spark,
        clean_pages,
        FX.aliases_df(spark),
        FX.entity_vecs_df(spark),
        checkpoint_root=root,
    )
    res["_root"] = root
    return res
