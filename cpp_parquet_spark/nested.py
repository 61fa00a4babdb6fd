"""Nested-column support: map / struct encode by COMPOSITION.

Parquet's data model nests via Dremel repetition/definition levels
(parquet.thrift LogicalTypes MAP/LIST; the Dremel paper). The engine's
page format stops at one list level by design — instead of teaching
every codec a level stack, nested columns are flattened to columns the
existing codec families already handle bit-exactly, and reassembled on
decode:

- ``struct<a, b, ...>``  ->  one column per leaf (``col.a`` etc.,
  recursive) plus a ``col#null`` boolean marking rows where the struct
  ITSELF is NULL (Dremel's def-level distinction between "struct null"
  and "all fields null", as one cheap RLE-friendly bool column).
- ``map<K, V>``          ->  two ALIGNED list columns ``col#keys`` /
  ``col#vals`` (Spark's ``map_keys``/``map_values`` read entries in
  stored order, so index i of both refers to the same entry). NULL map
  vs empty map survives because the list codecs' definition levels
  already distinguish null from empty rows.
- ``array<struct<...>>``  ->  one ALIGNED list column per struct field
  (``transform(col, x -> x.f)``) plus an ``array<tinyint>`` element
  null marker ``col#enull`` (Dremel's def-level distinction between a
  NULL struct ELEMENT and an element whose fields are all NULL). This
  is exactly Parquet's own columnar layout for repeated groups — each
  leaf stream gets its own best codec; the marker RLEs to nothing.

This is the same information Dremel levels carry, laid out
column-major: at 100 TB the struct-null column RLEs to near nothing and
each leaf gets its own best codec (a map of string->int rides ``lists``
for keys and ``listi`` for values) — strictly better compression than a
single interleaved group column, at the cost of a fixed column-count
expansion known at plan time.

Flattening is pure Spark column expressions (whole-stage codegen, no
Python) and the spec is a JSON-serializable list, so callers can stash
it in their own lineage (RUN.json rides ``EncodeConfig`` untouched).

Round-trip contract: ``unflatten(flatten(df)) == df`` for any df whose
leaves are engine-encodable types; deeper nesting with no aligned-list
form here (struct-in-map-value, array<struct<struct>>, map<_, map>)
raises the same loud ValueError the encode front door uses.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F, types as T

from .codecs import pagecodec

#: separator for synthesized column names — '#' cannot appear in the
#: flattened leaf names we generate, and real schemas rarely use it;
#: flatten() refuses a frame whose own columns collide.
SEP = "#"


def _leaf_ok(dt) -> bool:
    return pagecodec.spark_type_tag(dt) is not None


def flatten(df: DataFrame) -> tuple[DataFrame, list[dict]]:
    """-> (flat df, spec). Repeatedly rewrites the outermost
    struct/map/array<struct> columns until every column is
    engine-encodable; raises on shapes with no flat form here
    (struct/map inside map values, array<struct<struct>>, ...). The
    spec is ordered: ``unflatten`` replays it in REVERSE, so nested
    structs reassemble inside-out."""
    spec: list[dict] = [{"kind": "order", "cols": list(df.columns)}]
    changed = True
    while changed:
        changed = False
        for f in df.schema.fields:
            name, dt = f.name, f.dataType
            if isinstance(dt, T.StructType):
                kids = []
                for sf in dt.fields:
                    kid = f"{name}{SEP}{sf.name}"
                    if kid in df.columns:
                        raise ValueError(
                            f"flatten: synthesized column {kid!r} "
                            "collides with an existing column")
                    df = df.withColumn(kid, F.col(name)[sf.name])
                    kids.append((kid, sf.name))
                nullcol = f"{name}{SEP}null"
                df = (df.withColumn(nullcol, F.col(name).isNull())
                        .drop(name))
                spec.append({"kind": "struct", "col": name,
                             "fields": kids, "nullcol": nullcol})
                changed = True
                break
            if isinstance(dt, T.ArrayType) and \
                    isinstance(dt.elementType, T.StructType):
                est = dt.elementType
                bad_f = [sf.name for sf in est.fields
                         if not _leaf_ok(T.ArrayType(sf.dataType))]
                if bad_f:
                    raise ValueError(
                        f"flatten: array<struct> column {name!r} has "
                        f"fields with no aligned-list form: "
                        f"{bad_f} ({dt.simpleString()}) — restructure "
                        "them first")
                kids = []
                for sf in est.fields:
                    kid = f"{name}{SEP}{sf.name}"
                    if kid in df.columns:
                        raise ValueError(
                            f"flatten: synthesized column {kid!r} "
                            "collides with an existing column")
                    # single-arg lambda via factory: a default-arg
                    # lambda would have arity 2 and F.transform would
                    # feed the element INDEX into the second slot
                    def _getter(fname):
                        return lambda x: x[fname]
                    df = df.withColumn(
                        kid, F.transform(F.col(name), _getter(sf.name)))
                    kids.append((kid, sf.name))
                enull = f"{name}{SEP}enull"
                df = (df.withColumn(
                          enull,
                          F.transform(F.col(name),
                                      lambda x: x.isNull()
                                      .cast("tinyint")))
                        .drop(name))
                spec.append({"kind": "liststruct", "col": name,
                             "fields": kids, "enull": enull})
                changed = True
                break
            if isinstance(dt, T.MapType):
                if not (_leaf_ok(dt.keyType) and _leaf_ok(dt.valueType)):
                    raise ValueError(
                        f"flatten: map column {name!r} has non-scalar "
                        f"key/value ({dt.simpleString()}) — no flat "
                        "form; restructure it first")
                kc, vc = f"{name}{SEP}keys", f"{name}{SEP}vals"
                if kc in df.columns or vc in df.columns:
                    raise ValueError(
                        f"flatten: synthesized column {kc!r}/{vc!r} "
                        "collides with an existing column")
                df = (df.withColumn(kc, F.map_keys(name))
                        .withColumn(vc, F.map_values(name))
                        .drop(name))
                spec.append({"kind": "map", "col": name,
                             "keys": kc, "vals": vc})
                changed = True
                break
    bad = [f"{f.name} ({f.dataType.simpleString()})"
           for f in df.schema.fields if not _leaf_ok(f.dataType)]
    if bad:
        raise ValueError(
            "flatten: columns remain unencodable after struct/map "
            "rewriting: " + ", ".join(bad))
    return df, spec


def unflatten(df: DataFrame, spec: list[dict]) -> DataFrame:
    """Inverse of :func:`flatten` (replays the spec in reverse)."""
    order: list[str] | None = None
    for step in reversed(spec):
        if step["kind"] == "order":
            order = step["cols"]
        elif step["kind"] == "liststruct":
            kids = [kid for kid, _ in step["fields"]]
            zipped = F.arrays_zip(*[F.col(k) for k in kids])
            st = F.transform(
                zipped,
                lambda s: F.struct(*[s[kid].alias(fname)
                                     for kid, fname in step["fields"]]))
            rebuilt = F.zip_with(
                st, F.col(step["enull"]),
                lambda s, e: F.when(e == F.lit(1), F.lit(None))
                              .otherwise(s))
            df = (df.withColumn(step["col"], rebuilt)
                    .drop(step["enull"], *kids))
        elif step["kind"] == "map":
            df = (df.withColumn(
                      step["col"],
                      F.map_from_arrays(F.col(step["keys"]),
                                        F.col(step["vals"])))
                    .drop(step["keys"], step["vals"]))
        else:
            st = F.struct(*[F.col(kid).alias(fname)
                            for kid, fname in step["fields"]])
            df = (df.withColumn(
                      step["col"],
                      F.when(~F.col(step["nullcol"]), st))
                    .drop(step["nullcol"],
                          *[kid for kid, _ in step["fields"]]))
    if order is not None:
        have = set(df.columns)
        df = df.select(*[c for c in order if c in have],
                       *[c for c in df.columns if c not in set(order)])
    return df


def spec_json(spec: list[dict]) -> str:
    """Lineage-friendly serialized form (store next to RUN.json)."""
    return json.dumps(spec, separators=(",", ":"))


def spec_from_json(s: str) -> list[dict]:
    out = json.loads(s)
    for step in out:
        if step["kind"] == "struct":
            step["fields"] = [tuple(x) for x in step["fields"]]
    return out


def encode_nested(df: DataFrame, cfg, plan=None):
    """flatten + encode_table in one call -> (pages, spec)."""
    from .engine import encode_table
    flat, spec = flatten(df)
    return encode_table(flat, cfg, plan), spec


def decode_nested(pages: DataFrame, spec: list[dict],
                  spark=None, columns=None) -> DataFrame:
    """decode_table + unflatten in one call."""
    from .engine import decode_table
    return unflatten(decode_table(pages, spark, columns), spec)
