"""decode_image guard behavior (round-5 verdict #2).

The decoder must use PIL when it is present AND the payload decodes,
and fall back to the deterministic fake otherwise — it must NEVER
raise because the optional codec exists.  The certified multimodal
queries run over synthetic text-byte payloads, which are not valid
images, so their results are identical with or without PIL installed.
"""

from __future__ import annotations

import contextlib
import sys
import types


def _fake_dims(payload: bytes) -> dict:
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n // 7) % 64}


@contextlib.contextmanager
def _fake_pil(open_fn):
    """Install a minimal fake PIL/PIL.Image into sys.modules."""
    pil = types.ModuleType("PIL")
    image = types.ModuleType("PIL.Image")
    image.open = open_fn
    pil.Image = image
    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image")}
    sys.modules["PIL"] = pil
    sys.modules["PIL.Image"] = image
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_decode_image_falls_back_without_pil():
    from tailsql_spark.operators.multimodal import decode_image

    payload = b"not an image at all"
    assert decode_image(payload) == _fake_dims(payload)


def test_decode_image_uses_pil_when_payload_decodes():
    from tailsql_spark.operators.multimodal import decode_image

    class _Im:
        width, height = 640, 480

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    with _fake_pil(lambda buf: _Im()):
        assert decode_image(b"\x89PNG fake") == {"width": 640, "height": 480}


def test_decode_image_with_pil_present_never_raises_on_bad_payload():
    """The round-5 defect: PIL being importable must not break the
    pipeline — an undecodable payload takes the deterministic fake."""
    from tailsql_spark.operators.multimodal import decode_image

    def _raise(buf):
        raise OSError("cannot identify image file")

    payload = b"synthetic text payload"
    with _fake_pil(_raise):
        assert decode_image(payload) == _fake_dims(payload)


def test_multimodal_metadata_green_with_pil_importable(spark, oracle_sf_dir):
    """End-to-end: the certified query's dims still follow the
    deterministic-fake formula when a PIL module exists (text payloads
    never decode, so the fake path is taken either way)."""
    from pyspark.sql import functions as F

    from tailsql_spark.plans.registry import REGISTRY

    def _raise(buf):
        raise OSError("cannot identify image file")

    with _fake_pil(_raise):
        df = REGISTRY["multimodal_metadata"].build(spark, oracle_sf_dir)
        bad = df.filter(
            (F.col("width") != 16 + F.col("n_bytes") % 64)
            | (F.col("height") != 16 + F.floor(F.col("n_bytes") / 7) % 64)
        ).count()
    assert bad == 0
