"""Reference-exact flatten (explode) + whitelist projection.

The reference's signature operator: each nested-array element produces one
output row with the record's scalar fields copied in and the element's
fields merged over them; a record with NO array elements still yields one
base row (JSON: ``fileloader-schema.go:297-363`` + emit logic ``:113-122``;
XML: ``fileloader-schema.go:377-510``). SURVEY §2.3(a): the base row is
dropped when array rows exist, kept when they don't — i.e. exactly
``explode_outer`` semantics (empty/missing arrays survive as one row with
null element fields).

Projection parity (O9): parsed keys not in the column whitelist are
dropped (``fileloader-schema.go:299-302,486-505``); the reference logs a
warning per dropped key per record — here the schema diff is computed
once on the driver (same information, no per-row work).

Scale: ``explode_outer`` + ``select`` is whole-stage-codegen'd by
Catalyst; no shuffle, no Python in the row path. Column pruning pushes
through the explode into the file scan.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_nested(
    df: DataFrame,
    array_col: str = "fnumbers",
    columns: list[str] | None = None,
) -> DataFrame:
    """Explode ``array_col`` (array<struct>) into one row per element.

    Base (scalar) fields are replicated into each output row; element
    struct fields are appended; records whose array is empty or null
    yield one row with null element fields (explode_outer — SURVEY
    §2.3(a)). If ``columns`` is given, the result is projected to that
    whitelist in that order (O9 + §2.3(b) canonical ordering).
    """
    if array_col not in df.columns:
        return project_whitelist(df, columns) if columns else df
    elem_type = df.schema[array_col].dataType
    if not isinstance(elem_type, T.ArrayType) or not isinstance(elem_type.elementType, T.StructType):
        raise TypeError(f"{array_col!r} must be array<struct>, got {elem_type.simpleString()}")
    base_cols = [c for c in df.columns if c != array_col]
    exploded = df.select(*base_cols, F.explode_outer(F.col(array_col)).alias("_elem"))
    elem_fields = [f.name for f in elem_type.elementType.fields]
    out = exploded.select(*base_cols, *[F.col(f"_elem.{f}").alias(f) for f in elem_fields])
    return project_whitelist(out, columns) if columns else out


def flatten_all(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Fully flatten arbitrarily nested structs and arrays-of-struct.

    Generalizes the reference's single-level flatten (its XML path only
    explodes top-level repeated groups, ``fileloader-schema.go:455-475``;
    its JSON path one array level, ``:316-344``): struct fields are
    inlined as ``parent<sep>child`` columns; every array<struct> is
    exploded with ``explode_outer`` (§2.3(a) row-survival semantics),
    repeating until the schema is flat. Row count multiplies by array
    lengths — exactly one output row per combination of nested elements.

    Scale: each pass is a narrow projection/generator (no shuffle);
    Catalyst collapses consecutive projections, so the final plan is a
    single generate+project chain regardless of nesting depth.
    """
    for _ in range(max_depth):
        flat_cols = []
        exploded = False
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                flat_cols.extend(
                    F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}")
                    for sub in f.dataType.fields
                )
            elif (
                isinstance(f.dataType, T.ArrayType)
                and isinstance(f.dataType.elementType, T.StructType)
                and not exploded
            ):
                # one array per pass: simultaneous explodes would cross-join
                flat_cols.append(F.explode_outer(F.col(f.name)).alias(f.name))
                exploded = True
            else:
                flat_cols.append(F.col(f.name))
        new = df.select(*flat_cols)
        if new.schema == df.schema:
            return df
        df = new
    raise ValueError(f"nesting deeper than max_depth={max_depth}")


def project_whitelist(df: DataFrame, columns: list[str]) -> DataFrame:
    """Keep only whitelisted columns, in whitelist order (O9).

    Columns present in ``df`` but not whitelisted are dropped with one
    driver-side warning (reference logs per-row, ``fileloader-schema.go:
    326-338``); whitelisted columns absent from ``df`` materialize as
    nulls (reference: absent keys become ``""`` only at CSV export time,
    ``fileloader-schema.go:556-563`` — the relational layer keeps NULL).
    """
    present = set(df.columns)
    dropped = [c for c in df.columns if c not in columns]
    if dropped:
        warnings.warn(f"dropping non-whitelisted columns: {dropped}", stacklevel=2)
    return df.select(
        *[
            F.col(c) if c in present else F.lit(None).cast("string").alias(c)
            for c in columns
        ]
    )
