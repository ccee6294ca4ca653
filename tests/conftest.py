import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup


@pytest.fixture(scope="session")
def spark():
    from wdel_spark.session import get_spark

    s = get_spark("wdel_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_cfg():
    from wdel_spark.datagen import CorpusConfig

    return CorpusConfig(n_entities=300, n_docs=80)


@pytest.fixture(scope="session")
def kb_pandas(small_cfg):
    from wdel_spark.datagen import gen_kb_pandas

    return gen_kb_pandas(small_cfg)


@pytest.fixture(scope="session")
def corpus_spark(spark, small_cfg):
    from wdel_spark.datagen import gen_corpus_spark

    tables = gen_corpus_spark(spark, small_cfg, n_partitions=8)
    # cache the small test tables: reused across many tests
    for name in ("documents", "mention_gold"):
        tables[name] = tables[name].cache()
    return tables
