from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from wwwision_importservice_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def mutate_blob(rng, base: bytes) -> bytes:
    """Shared codec-fuzz mutator: one of byte flips (1-4), truncation,
    or garbage insertion (1-8 bytes) — used by the image-family and WAV
    error-contract fuzz tests so the mutation model can't drift between
    them."""
    blob = bytearray(base)
    op = rng.randrange(3)
    if op == 0:
        for _ in range(rng.randint(1, 4)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
    elif op == 1:
        blob = blob[: rng.randrange(1, len(blob))]
    else:
        pos = rng.randrange(len(blob))
        blob[pos:pos] = bytes(
            rng.randrange(256) for _ in range(rng.randint(1, 8))
        )
    return bytes(blob)
