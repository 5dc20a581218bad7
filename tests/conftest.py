import pytest

from ontology_mapping_spark.fixtures import make_fixture
from ontology_mapping_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", parallelism=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fx():
    # small but non-trivial: 30 matched pairs + 15 extras per side, 120 pages
    return make_fixture(n_pairs=30, n_extra_per_side=15, n_pages=120, seed=42)


@pytest.fixture(scope="session")
def fx_dfs(spark, fx):
    from ontology_mapping_spark.fixtures import fixture_dataframes

    triples, train, test, pages = fixture_dataframes(spark, fx)
    return {
        "triples": triples.cache(),
        "align_train": train.cache(),
        "align_test": test.cache(),
        "pages": pages.cache(),
    }
