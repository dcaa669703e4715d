import pytest

from pgs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pgs-tests", master="local[8]", shuffle_partitions=8)
    yield s


def edges_df(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


# FIXTURES.md §3 known-answer graphs (the two-adjacent-triangles discipline of
# PGS_ColoringTests.java:31-55 — tiny, hand-built, exact expectations).
PAIR = [(0, 1)]
PATH5 = [(0, 1), (1, 2), (2, 3), (3, 4)]
CYCLE4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
TRIANGLE_PLUS_TAIL = [(0, 1), (1, 2), (0, 2), (2, 3)]
TWO_CLIQUES = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(a, b) for a in range(10, 13) for b in range(a + 1, 13)]
)
STAR10 = [(0, i) for i in range(1, 11)]
DANGLING = [(0, 1), (2, 1)]
