"""Deterministic stand-in 'model' for the real-embedding slot test.

Importable by Spark's Python workers (repo root is on PYTHONPATH), so
make_model_embed_udf can resolve "tests.fake_model:factory" executor-side
exactly the way a spaCy/transformer factory would resolve in production.
"""

from __future__ import annotations

LOADS = 0
DIM = 8


def factory():
    """Zero-arg factory: counts loads (per Python worker process) and
    returns a texts -> vectors callable, the contract a real model
    factory fulfils."""
    global LOADS
    LOADS += 1

    def embed(texts):
        return [
            [float(len(t)), float(t.count("a"))] + [0.0] * (DIM - 2)
            for t in texts
        ]

    return embed
