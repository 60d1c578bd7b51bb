"""Registry-wide expression-totality gate (judge directive r8 #2).

Round 7 found two crash bugs in the class "Catalyst evaluates an
inferred predicate / codegen-shared subexpression BEFORE the user's
guard filter, so a partial expression (illegal sequence bounds, invalid
array index, division by zero — all hard errors under Spark 4 ANSI
mode) crashes on rows the query meant to filter out". The driver
testdata can never expose the class: its documents are uniformly
well-formed. This gate runs EVERY registry key against the adversarial
mini-corpus (``scripts/adversarial_corpus.py``: empty / whitespace-only
/ 1-token / NULL documents, empty / NULL / short / NaN vectors, NULL
and malformed event payloads) and requires full evaluation without an
exception — totality, not correctness (result values on this corpus
are checked nowhere; zero rows is a fine answer, a crash is not).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def adversarial_sf_dir(tmp_path_factory):
    from scripts.adversarial_corpus import build

    dst = tmp_path_factory.mktemp("advsf")
    return build(str(dst))


def _registry_keys():
    from data_ingestor_spark.plans.queries import REGISTRY

    return sorted(REGISTRY)


@pytest.mark.parametrize("key", _registry_keys())
def test_registry_key_total_on_adversarial_corpus(spark, adversarial_sf_dir, key):
    from data_ingestor_spark.plans.queries import REGISTRY

    # .collect(), never .count(): count() lets Catalyst prune every
    # projected column, which would skip evaluating the very
    # expressions this gate exists to exercise
    REGISTRY[key].fn(spark, adversarial_sf_dir).collect()
