"""Per-column decoding (SURVEY §2.4 C1-C4 parity).

The reference routes each sample member's raw bytes through the first
matching handler by key/extension (KeyPassThroughDecoder,
/root/reference/sdata/datapipeline.py:149-204), with ``partial`` (only decode
bytes), ``only`` (restrict keys), and ``passthrough_keys`` (force-decode)
options. Relationally, a "decoder" is a named column-expression factory
applied via select/withColumn — the routing table becomes a registry lookup.

Built-in decoders (all JVM expressions except image/audio, which are Pandas
UDF stages in multimodal.py):

- ``utf8``: bytes → string
- ``json``: JSON string/bytes → MapType or typed struct (with schema)
- ``int``/``float``: string → number (permissive: null on garbage, ANSI off)
- ``base64``: string → bytes
- ``hex``: bytes → hex string
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DecoderFn = Callable[[Column], Column]

_REGISTRY: dict[str, DecoderFn] = {
    "utf8": lambda c: c.cast("string"),
    "json": lambda c: F.from_json(c.cast("string"), "map<string,string>"),
    "int": lambda c: c.cast("string").cast("bigint"),
    "float": lambda c: c.cast("string").cast("double"),
    "base64": lambda c: F.unbase64(c.cast("string")),
    "hex": lambda c: F.hex(c),
}


def register_decoder(name: str, fn: DecoderFn) -> None:
    _REGISTRY[name] = fn


def get_decoder(name: str) -> DecoderFn:
    if name not in _REGISTRY:
        raise KeyError(f"unknown decoder {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def apply_decoder(df: DataFrame, spec: dict | str) -> DataFrame:
    """Apply one decode spec.

    ``spec`` forms:
      - ``"utf8"`` — decode every BinaryType column with this decoder
        (partial=True behavior: non-bytes columns pass through untouched,
        datapipeline.py:183-185).
      - ``{"key": "json", "decoder": "json", "schema": "..."}`` — decode one
        column; optional schema string for typed JSON.
    """
    from pyspark.sql import types as T

    if isinstance(spec, str):
        if spec in _IMAGE_SPECS:
            # reference decoder spec "pil"/"pilrgb"/... (ImageHandler names,
            # /root/reference/sdata/datapipeline.py:525-527): decode every
            # image-extension binary column. Applied by extension like the
            # reference's wds.Decoder, not to every binary column.
            for field in df.schema.fields:
                if (
                    isinstance(field.dataType, T.BinaryType)
                    and field.name.lower() in IMAGE_EXTENSIONS
                ):
                    df = _decode_image_column(df, field.name)
            return df
        fn = get_decoder(spec)
        for field in df.schema.fields:
            if isinstance(field.dataType, T.BinaryType):
                df = df.withColumn(field.name, fn(F.col(field.name)))
        return df
    key = spec["key"]
    name = spec.get("decoder", "utf8")
    if name in _IMAGE_SPECS:
        return _decode_image_column(df, key)
    if name == "json" and "schema" in spec:
        return df.withColumn(key, F.from_json(F.col(key).cast("string"), spec["schema"]))
    return df.withColumn(key, get_decoder(name)(F.col(key)))


#: Reference ImageHandler spec names we honor (all route to the in-repo
#: codecs) and the member extensions they apply to.
_IMAGE_SPECS = frozenset({"pil", "pilrgb", "image", "rgb"})
IMAGE_EXTENSIONS = frozenset({"jpg", "jpeg", "png", "ppm", "pgm", "pnm", "bmp", "image"})


def _decode_image_column(df: DataFrame, key: str) -> DataFrame:
    """Decode one binary image column with the pure-numpy codecs and re-emit
    as canonical lossless P6 bytes — the engine's decoded-pixels
    representation (the reference's is a PIL object; relational columns need
    a byte-stable equivalent). Arrow-batched pandas UDF, one in-place column
    replacement."""
    import pandas as pd

    @F.pandas_udf("binary")
    def dec(payloads):
        from datapipelines_spark.operators.imageops import encode_ppm
        from datapipelines_spark.operators.multimodal import decode_array

        return pd.Series(
            [
                None if p is None else encode_ppm(decode_array(bytes(p)))
                for p in payloads
            ]
        )

    return df.withColumn(key, dec(F.col(key)))
