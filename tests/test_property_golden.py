"""Property-based golden equality: random small site configurations must
always match the reference oracle (SURVEY.md §5 item 4). Uses seeded
parameter sampling rather than hypothesis-driven Spark runs (each case
costs a full crawl; hypothesis shrinking over Spark jobs is impractical),
but covers the same space: random dialect, branching, duplicate rate,
error rate, retry budget.
"""

import random

import pytest

from lyrics_crawler_spark.sitegen.graph import DIALECTS, SiteSpec
from tests.conftest import assert_golden


def _random_spec(rng: random.Random, i: int) -> SiteSpec:
    dialect = rng.choice(DIALECTS)
    return SiteSpec(
        dialect,
        f"http://prop{i}.example",
        seed=rng.randrange(10_000),
        n_seeds=rng.randint(1, 3),
        branch1=rng.randint(1, 3),
        branch2=rng.randint(0, 3),
        albums_per_artist=rng.randint(1, 2),
        songs_per_album=rng.randint(1, 2),
        n_pages=rng.randint(1, 3),
        songs_per_page=rng.randint(1, 2),
        dup_link_rate=rng.choice([0.0, 0.3, 0.6]),
        empty_movie_rate=rng.choice([0.0, 0.3]),
        error_rate=rng.choice([0.0, 0.2, 0.4]),
        max_err=rng.choice([1, 2, 4]),
        media_rate=rng.choice([0.0, 0.5, 1.0]),
        entity_rate=rng.choice([0.0, 0.5]),
    )


@pytest.mark.parametrize("case_seed", [101, 202, 303])
def test_random_configs_match_oracle(spark, tmp_store, case_seed):
    rng = random.Random(case_seed)
    specs = [_random_spec(rng, i) for i in range(2)]
    assert_golden(spark, specs, tmp_store)
