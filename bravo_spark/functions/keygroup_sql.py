"""Flink key-group routing (E1/E2) as pure SQL, in two dialects.

Generates the exact Flink ``MathUtils.murmurHash(key.hashCode()) %
maxParallelism`` computation (reference:
writer/functions/ValueStateToKeyedStateRow.java:55 via Flink
KeyGroupRangeAssignment — a public, documented algorithm) as a chain of
nested SELECTs runnable by BOTH Spark SQL and DuckDB, so the key-routing
expression itself is oracle-checkable. All arithmetic is on BIGINT values
masked to 32 bits; the one step that would overflow int64 (32×32-bit
multiply) is dialect-split: DECIMAL(38,0) on Spark, HUGEINT on DuckDB.

The Python reference implementation lives in bravo_spark.codecs.hashes;
tests assert the SQL and Python versions agree on both engines.
"""

from __future__ import annotations

M32 = 4_294_967_296  # 2^32
MASK32 = 4_294_967_295


def _mulmod(a: str, const: int, dialect: str) -> str:
    """(a * const) mod 2^32 without int64 overflow."""
    if dialect == "spark":
        return f"CAST((CAST({a} AS DECIMAL(38,0)) * {const}) % {M32} AS BIGINT)"
    if dialect == "duckdb":
        return f"CAST((CAST({a} AS HUGEINT) * {const}) % {M32} AS BIGINT)"
    raise ValueError(dialect)


def _xor(a: str, b: str, dialect: str) -> str:
    return f"({a} ^ {b})" if dialect == "spark" else f"xor({a}, {b})"


def _rotl(a: str, r: int) -> str:
    # a < 2^32 and the two terms occupy disjoint bit ranges, so + == |.
    return f"((({a} << {r}) & {MASK32}) + ({a} >> {32 - r}))"


def hash_code_steps(key: str, key_kind: str, dialect: str) -> list[tuple[str, str]]:
    """Java hashCode of the key as __hc (non-negative 32-bit pattern)."""
    if key_kind == "int":
        expr = f"(CAST({key} AS BIGINT) & {MASK32})"
    elif key_kind == "long":
        x = _xor(f"CAST({key} AS BIGINT)", f"(CAST({key} AS BIGINT) >> 32)", dialect)
        expr = f"({x} & {MASK32})"
    else:
        raise ValueError(f"unsupported key kind {key_kind!r}")
    return [("__hc", expr)]


def murmur_steps(dialect: str, src: str = "__hc") -> list[tuple[str, str]]:
    """Flink MathUtils.murmurHash as (col, expr) steps over prior cols."""
    s: list[tuple[str, str]] = []
    s.append(("__m1", _mulmod(src, 0xCC9E2D51, dialect)))
    s.append(("__m2", _rotl("__m1", 15)))
    s.append(("__m3", _mulmod("__m2", 0x1B873593, dialect)))
    s.append(("__m4", _rotl("__m3", 13)))
    s.append(("__m5", f"((__m4 * 5 + {0xE6546B64}) % {M32})"))
    s.append(("__m6", _xor("__m5", "4", dialect)))
    s.append(("__m7", _xor("__m6", "(__m6 >> 16)", dialect)))
    s.append(("__m8", _mulmod("__m7", 0x85EBCA6B, dialect)))
    s.append(("__m9", _xor("__m8", "(__m8 >> 13)", dialect)))
    s.append(("__m10", _mulmod("__m9", 0xC2B2AE35, dialect)))
    s.append(("__m11", _xor("__m10", "(__m10 >> 16)", dialect)))
    # fold to signed, then Flink's abs-with-MIN_VALUE→0 guard
    s.append(("__ms", f"(CASE WHEN __m11 >= {M32 // 2} THEN __m11 - {M32} ELSE __m11 END)"))
    s.append((
        "__mh",
        f"(CASE WHEN __ms >= 0 THEN __ms WHEN __ms = -{M32 // 2} THEN 0 ELSE -__ms END)",
    ))
    return s


def chain(input_sql: str, steps: list[tuple[str, str]], final_select: str) -> str:
    """Wrap ``input_sql`` in one nested SELECT per step (each step may refer
    to all previous step columns), then project ``final_select``."""
    sql = f"({input_sql})"
    for i, (name, expr) in enumerate(steps):
        sql = f"(SELECT *, {expr} AS {name} FROM {sql} AS __t{i})"
    return f"SELECT {final_select} FROM {sql} AS __tf"


def key_group_sql(
    input_sql: str,
    key: str,
    *,
    key_kind: str,
    max_parallelism: int,
    dialect: str,
    extra_cols: str = "",
    key_group_col: str = "key_group",
) -> str:
    """Full query: input relation + Flink key-group column of ``key``."""
    steps = hash_code_steps(key, key_kind, dialect) + murmur_steps(dialect)
    steps.append((key_group_col, f"(__mh % {max_parallelism})"))
    cols = f"{key}, {key_group_col}" + (f", {extra_cols}" if extra_cols else "")
    return chain(input_sql, steps, cols)


def operator_index_expr(key_group_col: str, max_parallelism: int, parallelism: int) -> str:
    """E2 — keyGroup * parallelism / maxParallelism with integer floor
    (types/KeyedStateRow.java:65-68); same expression in both dialects.
    Explicit floor() because CAST(double AS INT) truncates on Spark but
    rounds on DuckDB."""
    return f"CAST(floor(({key_group_col} * {parallelism}) / {max_parallelism}) AS INT)"
