"""Pipeline specification + stage registry + post-agg statements.

The reference's user-extension surface, re-expressed:

- **Stage registry** — the OCB manifest's component registry
  (distributions/elastic-components/manifest.yaml): named stage
  factories a spec refers to.
- **PipelineSpec** — the integration-template idea
  (receiver/integrationreceiver/README.md:17-25,
  pkg/integrations): a declarative description of a pipeline
  (source → stages → router → aggregation) with validation at build
  time, mirroring the reference's config Validate() rules (interval
  multiples lsminterval config.go:110-117; routing rules
  dynamicroutingconnector README.md:128-134).
- **Statements** — the OTTL statements applied to aggregated
  datapoints (lsmintervalprocessor config/config.go:70-78, executed
  processor.go:556-605; statements like
  ``set(attributes["metricset.interval"], "1m")`` built at
  elasticapmconnector config.go:171-183).  Round 3 widened the round-2
  set/concat-only support to an OTTL subset — editors set / concat /
  delete_key / keep_keys / truncate_all / replace_pattern, value
  converters Concat / Substring / Int / Double, and per-row ``where``
  conditions — each statement compiled once to vectorized Arrow
  kernels and applied in one ``map_batches`` (grammar below).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.aggregate import validate_intervals
from ..stages.route import RouterConfig

# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# OTTL-subset grammar (round-3 expansion of the round-2 set/concat-only
# support).  The reference accepts an open OTTL grammar on aggregated
# datapoints (lsmintervalprocessor config/config.go:70-78); this engine
# implements the columnar subset that maps to vectorized Arrow kernels:
#
#   statement := editor [ "where" condition ]
#   editor    := set(col, value) | concat(col, [col, ...], "sep")
#              | delete_key(col) | delete_matching_keys("re")
#              | keep_keys([col, ...]) | limit(n [, [col, ...]])
#              | truncate_all(n) | replace_pattern(col, "re", "repl")
#              | replace_all_patterns("key"|"value", "re", "repl")
#              | merge_maps("dst_prefix", "src_prefix",
#                           "insert"|"update"|"upsert")
#   value     := "string" | 123 | 1.5 | col
#              | Concat([value, ...], "sep") | Substring(value, i, n)
#              | Int(value) | Double(value) | String(value) | Len(value)
#              | IsMatch(value, "re") | ConvertCase(value, "upper"|"lower")
#              | Trim(value) | MD5(value) | SHA256(value)
#              | Hour(value) | Minute(value) | Second(value)
#              | Day(value) | Month(value) | Year(value)
#              | UnixSeconds(value) | UnixMilli(value)
#              | UnixMicro(value) | UnixNano(value)
#              | TruncateTime(value, "1h") | FormatTime(value, "%Y-%m-%d")
#   col       := name { "." name } { '["key"]' }
#              (round 5: OTTL context paths — attributes["k"],
#              resource.attributes["k"],
#              instrumentation_scope.attributes["k"], the shapes the
#              reference's own statements use,
#              lsmintervalprocessor processor_test.go:77-80 — resolve
#              to the dot-flattened column, e.g.
#              resource.attributes.k; see _Parser.colref)
#
# merge_maps is the columnar reading of ottlfuncs merge_maps: a "map"
# is a column-name prefix group, a per-row missing key is a NULL —
# insert fills only null dst cells (and creates missing dst columns),
# update overwrites only non-null dst cells and creates nothing,
# upsert does both (ottlfuncs/func_merge_maps.go strategies).
# replace_all_patterns mirrors ottlfuncs replace_all_patterns: mode
# "value" regex-rewrites every string column's values, mode "key"
# renames matching column names.
#   condition := cmp { ("and" | "or") cmp }
#   cmp       := value [ ("==" | "!=" | ">" | ">=" | "<" | "<=")
#                ("string" | number | col) ]
#                (a bare boolean converter, e.g. IsMatch, is a
#                complete comparison)
#
# ``where`` masks the statement per row (pc.if_else against the
# original column).  Everything else in real OTTL (map/slice VALUES,
# the full converter library) is a documented non-goal — config
# validation rejects it loudly at build time.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r'\s*(?:(?P<str>"[^"]*")|(?P<num>-?\d+\.\d+|-?\d+)'
    r'|(?P<name>[A-Za-z_][\w.]*)|(?P<op>==|!=|>=|<=|[(),\[\]><]))'
)


def _tokenize(s: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"unparseable statement near {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self, expect_kind=None, expect_val=None):
        k, v = self.peek()
        if k is None:
            raise ValueError("unexpected end of statement")
        if expect_kind and k != expect_kind:
            raise ValueError(f"expected {expect_kind}, got {v!r}")
        if expect_val and v != expect_val:
            raise ValueError(f"expected {expect_val!r}, got {v!r}")
        self.i += 1
        return k, v

    def colref(self, base: str) -> str:
        """OTTL context path → flattened column name (round 5): the
        reference's statements address attributes through context
        paths — ``attributes["k"]``, ``resource.attributes["k"]``,
        ``instrumentation_scope.attributes["k"]`` (the exact shapes in
        lsmintervalprocessor processor_test.go:77-80) — and this
        engine stores attribute maps as dot-flattened columns, so the
        path ``resource.attributes["k"]`` IS the column
        ``resource.attributes.k``.  Consumes any trailing
        ``["key"]`` subscripts after a name token."""
        while self.peek()[1] == "[" and (
            self.i + 1 < len(self.toks) and self.toks[self.i + 1][0] == "str"
        ):
            self.next()
            _, key = self.next(expect_kind="str")
            self.next(expect_val="]")
            base = f"{base}.{key[1:-1]}"
        return base

    # value := literal | col | converter(...)
    def value(self):
        k, v = self.next()
        if k == "str":
            lit = v[1:-1]
            return lambda t: pa.array([lit] * t.num_rows, pa.string())
        if k == "num":
            if "." in v:
                num = float(v)
                return lambda t: pa.array([num] * t.num_rows, pa.float64())
            inum = int(v)
            return lambda t: pa.array([inum] * t.num_rows, pa.int64())
        if k != "name":
            raise ValueError(f"expected value, got {v!r}")
        nk, nv = self.peek()
        if nv == "(":  # converter
            return self.converter(v)
        col = self.colref(v)
        return lambda t: t[col]

    def value_list(self):
        self.next(expect_val="[")
        vals = [self.value()]
        while self.peek()[1] == ",":
            self.next()
            vals.append(self.value())
        self.next(expect_val="]")
        return vals

    def converter(self, name: str):
        self.next(expect_val="(")
        if name == "Concat":
            vals = self.value_list()
            self.next(expect_val=",")
            _, sep = self.next(expect_kind="str")
            sep = sep[1:-1]
            self.next(expect_val=")")
            return lambda t: pc.binary_join_element_wise(
                *[pc.cast(v(t), pa.string()) for v in vals], sep
            )
        if name == "Substring":
            v = self.value()
            self.next(expect_val=",")
            _, start = self.next(expect_kind="num")
            self.next(expect_val=",")
            _, length = self.next(expect_kind="num")
            self.next(expect_val=")")
            start_i, len_i = int(start), int(length)
            # ottlfuncs func_substring.go:30-36 rejects negative
            # start/length at call time; our build-time equivalent
            # (short values clamp instead of erroring per row — the
            # columnar trade, documented)
            if start_i < 0 or len_i < 0:
                raise ValueError(
                    "Substring start/length must be non-negative"
                )
            return lambda t: pc.utf8_slice_codeunits(
                pc.cast(v(t), pa.string()), start_i, start_i + len_i
            )
        if name in ("Int", "Double", "String"):
            v = self.value()
            self.next(expect_val=")")
            typ = {
                "Int": pa.int64(),
                "Double": pa.float64(),
                "String": pa.string(),
            }[name]
            return lambda t: pc.cast(v(t), typ)
        if name == "MD5":
            # ottlfuncs MD5(target): lowercase hex digest (the same
            # vectorized core as the error-grouping key, md5vec.py)
            v = self.value()
            self.next(expect_val=")")

            def md5_val(t: pa.Table):
                from ..functions.md5vec import md5_hex

                arr = pc.cast(v(t), pa.string())
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                return md5_hex(arr)

            return md5_val
        if name == "SHA256":
            # ottlfuncs SHA256(target): lowercase hex digest
            # (sha256vec.py: hashlib's hardware-SHA core over zero-copy
            # Arrow buffer slices)
            v = self.value()
            self.next(expect_val=")")

            def sha_val(t: pa.Table):
                from ..functions.sha256vec import sha256_hex

                arr = pc.cast(v(t), pa.string())
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                return sha256_hex(arr)

            return sha_val
        if name == "Len":
            # ottlfuncs Len: length of a string value (codepoints)
            v = self.value()
            self.next(expect_val=")")
            return lambda t: pc.cast(
                pc.utf8_length(pc.cast(v(t), pa.string())), pa.int64()
            )
        if name == "ConvertCase":
            # ottlfuncs ConvertCase(target, "upper"|"lower")
            v = self.value()
            self.next(expect_val=",")
            _, mode = self.next(expect_kind="str")
            self.next(expect_val=")")
            mode_s = mode[1:-1]
            if mode_s not in ("upper", "lower"):
                raise ValueError(
                    f"ConvertCase supports upper/lower, got {mode_s!r}"
                )
            kern = pc.utf8_upper if mode_s == "upper" else pc.utf8_lower
            return lambda t: kern(pc.cast(v(t), pa.string()))
        if name == "Trim":
            # ottlfuncs Trim(target): strip leading/trailing whitespace
            v = self.value()
            self.next(expect_val=")")
            return lambda t: pc.utf8_trim_whitespace(
                pc.cast(v(t), pa.string())
            )
        if name in ("Hour", "Minute", "Second", "Day", "Month", "Year"):
            # ottlfuncs Hour/Minute/Second/Day/Month/Year(target):
            # the timestamp component as int64
            v = self.value()
            self.next(expect_val=")")
            kern = {
                "Hour": pc.hour, "Minute": pc.minute,
                "Second": pc.second, "Day": pc.day,
                "Month": pc.month, "Year": pc.year,
            }[name]
            return lambda t: pc.cast(kern(v(t)), pa.int64())
        if name in ("UnixMilli", "UnixMicro", "UnixNano"):
            # ottlfuncs UnixMilli/UnixMicro/UnixNano(target): Go
            # Time.UnixMilli/Micro/Nano — integer epoch at that
            # resolution (truncation == floor for the non-negative
            # timestamps this engine processes, same caveat as
            # UnixSeconds)
            v = self.value()
            self.next(expect_val=")")

            def unix_n(t: pa.Table, _name=name):
                arr = pc.cast(v(t), pa.timestamp("us"), safe=False)
                us = pc.cast(arr, pa.int64())
                if _name == "UnixMilli":
                    return pc.divide(us, 1000)
                if _name == "UnixMicro":
                    return us
                return pc.multiply(us, 1000)

            return unix_n
        if name == "UnixSeconds":
            # ottlfuncs UnixSeconds(target): Go Time.Unix() — whole
            # seconds since epoch (truncation == floor for the
            # non-negative timestamps this engine processes)
            v = self.value()
            self.next(expect_val=")")

            def unix_s(t: pa.Table):
                arr = pc.cast(v(t), pa.timestamp("us"), safe=False)
                return pc.divide(pc.cast(arr, pa.int64()), 1_000_000)

            return unix_s
        if name == "TruncateTime":
            # ottlfuncs TruncateTime(target, duration): Go
            # Time.Truncate — floor to a multiple of the duration.
            # Duration subset: <n><unit>, unit ∈ h|m|s|ms|us|ns
            v = self.value()
            self.next(expect_val=",")
            _, dur = self.next(expect_kind="str")
            self.next(expect_val=")")
            m = re.fullmatch(r"(\d+)(h|m|s|ms|us|ns)", dur[1:-1])
            if not m:
                raise ValueError(
                    f"TruncateTime duration must be <n><h|m|s|ms|us|ns>,"
                    f" got {dur!r}"
                )
            mult = int(m.group(1))
            unit = {
                "h": "hour", "m": "minute", "s": "second",
                "ms": "millisecond", "us": "microsecond",
                "ns": "nanosecond",
            }[m.group(2)]
            return lambda t: pc.floor_temporal(
                v(t), multiple=mult, unit=unit
            )
        if name == "FormatTime":
            # ottlfuncs FormatTime(target, format) — strftime layout
            # (the Go side takes a Go layout string; the columnar
            # subset takes strftime, the layout DuckDB/Arrow share)
            v = self.value()
            self.next(expect_val=",")
            _, fmt = self.next(expect_kind="str")
            self.next(expect_val=")")
            fmt_s = fmt[1:-1]
            return lambda t: pc.strftime(v(t), format=fmt_s)
        if name == "IsMatch":
            # ottlfuncs IsMatch(target, pattern): RE2 search semantics
            # (Go regexp.MatchString); usable standalone in a where
            # condition or compared like any value
            v = self.value()
            self.next(expect_val=",")
            _, pat = self.next(expect_kind="str")
            self.next(expect_val=")")
            pat_s = pat[1:-1]
            return lambda t: pc.match_substring_regex(
                pc.cast(v(t), pa.string()), pat_s
            )
        raise ValueError(f"unknown converter {name!r}")

    # condition := cmp {and/or cmp}
    def condition(self):
        left = self.cmp()
        while self.peek()[1] in ("and", "or"):
            _, op = self.next()
            right = self.cmp()
            l = left
            left = (
                (lambda a, b: lambda t: pc.and_kleene(a(t), b(t)))(l, right)
                if op == "and"
                else (lambda a, b: lambda t: pc.or_kleene(a(t), b(t)))(
                    l, right
                )
            )
        return left

    def cmp(self):
        # lhs is any value (column, literal, converter — Len enables
        # length predicates); a bare boolean converter (IsMatch) with
        # no comparison operator IS the comparison
        lhs = self.value()
        _, op = self.peek()
        if op not in ("==", "!=", ">", ">=", "<", "<="):
            return lambda t: pc.cast(lhs(t), pa.bool_())
        self.next()
        k, rv = self.next()
        if k == "str":
            rhs = rv[1:-1]
        elif k == "num":
            rhs = float(rv) if "." in rv else int(rv)
        elif k == "name":
            rhs = ("__col__", self.colref(rv))
        else:
            raise ValueError(f"bad comparison operand {rv!r}")
        fn = {
            "==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
            ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
        }[op]

        def ev(t: pa.Table):
            r = t[rhs[1]] if isinstance(rhs, tuple) else rhs
            return fn(lhs(t), r)

        return ev


def _set_col(t: pa.Table, col: str, arr) -> pa.Table:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if col in t.column_names:
        return t.set_column(t.schema.get_field_index(col), col, arr)
    return t.append_column(col, arr)


def parse_statement(stmt: str) -> Callable[[pa.Table], pa.Table]:
    """Compile one OTTL-subset statement string to a vectorized batch
    transform (grammar in the module-section comment above).  Raises
    ``ValueError`` on anything outside the subset — config validation
    runs this at build time, so bad statements fail loudly before any
    data moves."""
    stmt = stmt.strip()
    p = _Parser(_tokenize(stmt))
    _, editor = p.next(expect_kind="name")

    cond = None

    def tail_condition():
        nonlocal cond
        if p.peek()[1] == "where":
            p.next()
            cond = p.condition()
        if p.peek() != (None, None):
            raise ValueError(f"trailing tokens in statement: {stmt!r}")

    def masked(t: pa.Table, col: str, new_arr) -> pa.Table:
        if cond is None:
            return _set_col(t, col, new_arr)
        mask = pc.fill_null(cond(t), False)
        if isinstance(new_arr, pa.ChunkedArray):
            new_arr = new_arr.combine_chunks()
        if col in t.column_names:
            old = t[col]
            if old.type != new_arr.type:
                old = pc.cast(old, new_arr.type)
            merged = pc.if_else(mask, new_arr, old)
        else:
            merged = pc.if_else(
                mask, new_arr, pa.nulls(t.num_rows, new_arr.type)
            )
        return _set_col(t, col, merged)

    if editor == "set":
        p.next(expect_val="(")
        _, col = p.next(expect_kind="name")
        col = p.colref(col)
        p.next(expect_val=",")
        val = p.value()
        p.next(expect_val=")")
        tail_condition()
        return lambda t: masked(t, col, val(t))

    if editor == "concat":
        p.next(expect_val="(")
        _, col = p.next(expect_kind="name")
        col = p.colref(col)
        p.next(expect_val=",")
        parts = p.value_list()
        p.next(expect_val=",")
        _, sep = p.next(expect_kind="str")
        sep = sep[1:-1]
        p.next(expect_val=")")
        tail_condition()

        def apply_concat(t: pa.Table) -> pa.Table:
            arr = pc.binary_join_element_wise(
                *[pc.cast(v(t), pa.string()) for v in parts], sep
            )
            return masked(t, col, arr)

        return apply_concat

    if editor == "delete_key":
        p.next(expect_val="(")
        _, col = p.next(expect_kind="name")
        col = p.colref(col)
        p.next(expect_val=")")
        tail_condition()
        if cond is not None:
            raise ValueError("delete_key does not support where clauses")
        return lambda t: (
            t.drop_columns([col]) if col in t.column_names else t
        )

    if editor == "delete_matching_keys":
        # ottlfuncs delete_matching_keys(target, pattern): drop every
        # column whose NAME matches the RE2 pattern (search semantics)
        p.next(expect_val="(")
        _, pat = p.next(expect_kind="str")
        p.next(expect_val=")")
        tail_condition()
        if cond is not None:
            raise ValueError(
                "delete_matching_keys does not support where clauses"
            )
        rx = re.compile(pat[1:-1])
        return lambda t: t.drop_columns(
            [c for c in t.column_names if rx.search(c)]
        )

    if editor == "limit":
        # ottlfuncs limit(target, n, priority_keys): keep at most n
        # columns — priority keys first, then schema order (the
        # deterministic columnar reading of Go's unspecified map
        # iteration)
        p.next(expect_val="(")
        _, n = p.next(expect_kind="num")
        prio: List[str] = []
        if p.peek()[1] == ",":
            p.next()
            p.next(expect_val="[")
            _, first = p.next(expect_kind="name")
            prio.append(p.colref(first))
            while p.peek()[1] == ",":
                p.next()
                _, nxt = p.next(expect_kind="name")
                prio.append(p.colref(nxt))
            p.next(expect_val="]")
        p.next(expect_val=")")
        tail_condition()
        if cond is not None:
            raise ValueError("limit does not support where clauses")
        keep_n = int(n)

        def apply_limit(t: pa.Table) -> pa.Table:
            keep = [c for c in prio if c in t.column_names]
            for c in t.column_names:
                if len(keep) >= keep_n:
                    break
                if c not in keep:
                    keep.append(c)
            return t.select(
                [c for c in t.column_names if c in keep[:keep_n]]
            )

        return apply_limit

    if editor == "keep_keys":
        p.next(expect_val="(")
        p.next(expect_val="[")
        keep = []
        _, first = p.next(expect_kind="name")
        keep.append(p.colref(first))
        while p.peek()[1] == ",":
            p.next()
            _, nxt = p.next(expect_kind="name")
            keep.append(p.colref(nxt))
        p.next(expect_val="]")
        p.next(expect_val=")")
        tail_condition()
        if cond is not None:
            raise ValueError("keep_keys does not support where clauses")
        return lambda t: t.select(
            [c for c in t.column_names if c in keep]
        )

    if editor == "truncate_all":
        p.next(expect_val="(")
        _, n = p.next(expect_kind="num")
        p.next(expect_val=")")
        tail_condition()
        if cond is not None:
            raise ValueError("truncate_all does not support where clauses")
        limit = int(n)

        def apply_trunc(t: pa.Table) -> pa.Table:
            for i, f in enumerate(t.schema):
                if pa.types.is_string(f.type):
                    t = t.set_column(
                        i, f.name,
                        pc.utf8_slice_codeunits(t[f.name], 0, limit),
                    )
            return t

        return apply_trunc

    if editor == "replace_pattern":
        p.next(expect_val="(")
        _, col = p.next(expect_kind="name")
        col = p.colref(col)
        p.next(expect_val=",")
        _, pat = p.next(expect_kind="str")
        p.next(expect_val=",")
        _, repl = p.next(expect_kind="str")
        p.next(expect_val=")")
        tail_condition()
        pat_s, repl_s = pat[1:-1], repl[1:-1]

        def apply_repl(t: pa.Table) -> pa.Table:
            arr = pc.replace_substring_regex(t[col], pat_s, repl_s)
            return masked(t, col, arr)

        return apply_repl

    if editor == "replace_all_patterns":
        # ottlfuncs replace_all_patterns(target, mode, regex, repl):
        # mode "value" rewrites every string column's values (Go
        # ReplaceAllString = replace every non-overlapping match);
        # mode "key" renames matching column names.  Value mode honors
        # ``where`` per row; key mode is schema-level, so a row
        # condition is rejected like the other schema editors.
        p.next(expect_val="(")
        _, mode = p.next(expect_kind="str")
        p.next(expect_val=",")
        _, pat = p.next(expect_kind="str")
        p.next(expect_val=",")
        _, repl = p.next(expect_kind="str")
        p.next(expect_val=")")
        tail_condition()
        mode_s, pat_s, repl_s = mode[1:-1], pat[1:-1], repl[1:-1]
        if mode_s not in ("key", "value"):
            raise ValueError(
                f"replace_all_patterns mode must be key|value, got {mode_s!r}"
            )
        if mode_s == "key":
            if cond is not None:
                raise ValueError(
                    "replace_all_patterns(key) does not support where"
                )
            rx = re.compile(pat_s)
            return lambda t: t.rename_columns(
                [rx.sub(repl_s, c) for c in t.column_names]
            )

        def apply_all_values(t: pa.Table) -> pa.Table:
            for f in t.schema:
                if pa.types.is_string(f.type):
                    arr = pc.replace_substring_regex(
                        t[f.name], pat_s, repl_s
                    )
                    t = masked(t, f.name, arr)
            return t

        return apply_all_values

    if editor == "merge_maps":
        # columnar merge_maps (ottlfuncs func_merge_maps.go): maps are
        # column-name prefix groups, per-row missing key = NULL.
        # insert fills only null dst cells + creates missing dst
        # columns; update overwrites only non-null dst cells, creates
        # nothing; upsert overwrites and creates.
        p.next(expect_val="(")
        _, dst = p.next(expect_kind="str")
        p.next(expect_val=",")
        _, src = p.next(expect_kind="str")
        p.next(expect_val=",")
        _, strat = p.next(expect_kind="str")
        p.next(expect_val=")")
        tail_condition()
        dst_p, src_p, strat_s = dst[1:-1], src[1:-1], strat[1:-1]
        if strat_s not in ("insert", "update", "upsert"):
            raise ValueError(
                "merge_maps strategy must be insert|update|upsert, "
                f"got {strat_s!r}"
            )

        def apply_merge(t: pa.Table) -> pa.Table:
            for sc in t.column_names:
                if not sc.startswith(src_p):
                    continue
                key = sc[len(src_p):]
                dc = dst_p + key
                sarr = t[sc]
                if isinstance(sarr, pa.ChunkedArray):
                    sarr = sarr.combine_chunks()
                if dc in t.column_names:
                    darr = t[dc]
                    if strat_s == "insert":
                        merged = pc.coalesce(darr, sarr)
                    elif strat_s == "update":
                        merged = pc.if_else(
                            pc.is_valid(darr), sarr, darr
                        )
                    else:  # upsert
                        merged = sarr
                    t = masked(t, dc, merged)
                elif strat_s in ("insert", "upsert"):
                    t = masked(t, dc, sarr)
            return t

        return apply_merge

    raise ValueError(f"unknown editor {editor!r} in statement: {stmt!r}")


# A statement pipeline exercising every editor and converter of the
# subset, with a hand-mirrored SQL twin (the t_ottl oracle gate):
# sequential semantics matter — stmt 8's where reads the tool column
# AFTER stmt 7 rewrote it, and truncate_all runs before keep_keys.
DEMO_STATEMENTS: Tuple[str, ...] = (
    'set(tier, "std")',
    'set(tier, "gold") where role == "assistant"',
    'concat(conv_turn, [conv_id, turn_idx], "-")',
    'set(role3, Substring(role, 0, 3))',
    'set(turn_d, Double(turn_idx))',
    'set(half_turn, Int(turn_d)) where turn_idx >= 10',
    'replace_pattern(tool, "^$", "none")',
    'set(label, Concat([role, tool], ":")) where tool != "none"',
    # round-4 tier: Len converter, bare-IsMatch condition,
    # delete_matching_keys, limit with priority keys
    'set(text_len, Len(text))',
    'set(tool_kind, "compute") where IsMatch(tool, "^(calc|python|shell)")',
    'set(role_up, ConvertCase(role, "upper"))',
    # round-5 tier: time-family converters over the event timestamp
    # (ottlfuncs Hour/UnixSeconds/TruncateTime/FormatTime)
    'set(ts_hour, Hour(ts))',
    'set(ts_unix, UnixSeconds(ts))',
    'set(ts_trunc, TruncateTime(ts, "1h"))',
    'set(ts_fmt, FormatTime(ts, "%Y-%m-%d"))',
    # round-5 tier 2: the rest of the ottlfuncs time family
    'set(ts_min, Minute(ts))',
    'set(ts_day, Day(ts))',
    'set(ts_mon, Month(ts))',
    'set(ts_year, Year(ts))',
    'set(ts_ms, UnixMilli(ts))',
    'set(ts_ns, UnixNano(ts))',
    'set(tmp_scratch, "x")',
    'delete_matching_keys("^tmp_")',
    "truncate_all(40)",
    'set(extra_junk, "zzz")',
    "keep_keys([conv_id, turn_idx, role, tool, text, tier, conv_turn,"
    " role3, turn_d, half_turn, label, text_len, tool_kind, role_up,"
    " ts_hour, ts_unix, ts_trunc, ts_fmt, ts_min, ts_day, ts_mon,"
    " ts_year, ts_ms, ts_ns, extra_junk])",
    # 25 kept columns -> limit to 24 drops the lowest-priority one
    # (extra_junk, last in schema order)
    "limit(24, [conv_id, turn_idx])",
    # round-5 tier: merge_maps strategies (prefix-as-map, null =
    # per-row missing key), replace_all_patterns in both modes,
    # String/MD5 converters
    'set(m1_a, "keep") where role == "user"',
    'set(m2_a, "fill")',
    'set(m2_b, "new")',
    'merge_maps("m1_", "m2_", "insert")',
    'set(m3_a, "old")',
    'merge_maps("m3_", "m2_", "update")',
    'set(probe, "vzzz")',
    'replace_all_patterns("value", "zzz$", "qqq")',
    'replace_all_patterns("key", "^probe$", "probe2")',
    'set(text_md5, MD5(text))',
    'set(conv_sha, SHA256(conv_id))',
    'set(turn_s, String(turn_idx))',
    # round-5 tier: OTTL context paths — the reference's own statement
    # shapes (lsmintervalprocessor processor_test.go:77-80) verbatim
    # modulo attr names, addressing dot-flattened columns
    'set(attributes["custom_dp_attr"], "dp")',
    'set(resource.attributes["custom_res_attr"], "res")',
    'set(instrumentation_scope.attributes["custom_scope_attr"], "scope")',
    'set(resource.attributes["dependent_attr"],'
    ' Concat([attributes["custom_dp_attr"], "dependent"], "-"))',
    'set(attributes["role_attr"], role) where attributes["custom_dp_attr"]'
    ' == "dp"',
)

# The DuckDB mirror of DEMO_STATEMENTS over the transcripts CTE.  Only
# `text` can exceed the 40-codeunit truncation (every other string
# column is provably shorter), so the twin truncates just it;
# text_len reads the PRE-truncation length (the statement runs before
# truncate_all); tmp_scratch / extra_junk are deleted by
# delete_matching_keys / limit, so the twin never selects them.
# replace_all_patterns("value", "zzz$", "qqq") rewrites every string
# column live at that point: the twin wraps each DATA-DEPENDENT string
# expression in the same regexp_replace (constants that provably never
# match — the tier/m*/merge outputs — are left bare); text_md5 hashes
# the post-truncation post-replace text, exactly the statement order.
DEMO_STATEMENTS_SQL = """
SELECT
  regexp_replace(conv_id, 'zzz$', 'qqq', 'g') AS conv_id,
  turn_idx,
  regexp_replace(role, 'zzz$', 'qqq', 'g') AS role,
  regexp_replace(regexp_replace(tool, '^$', 'none'),
                 'zzz$', 'qqq', 'g') AS tool,
  regexp_replace(left(text, 40), 'zzz$', 'qqq', 'g') AS text,
  CASE WHEN role = 'assistant' THEN 'gold' ELSE 'std' END AS tier,
  regexp_replace(conv_id || '-' || CAST(turn_idx AS VARCHAR),
                 'zzz$', 'qqq', 'g') AS conv_turn,
  regexp_replace(substr(role, 1, 3), 'zzz$', 'qqq', 'g') AS role3,
  CAST(turn_idx AS DOUBLE) AS turn_d,
  CASE WHEN turn_idx >= 10 THEN CAST(turn_idx AS BIGINT) END AS half_turn,
  regexp_replace(
    CASE WHEN regexp_replace(tool, '^$', 'none') <> 'none'
         THEN role || ':' || regexp_replace(tool, '^$', 'none')
    END, 'zzz$', 'qqq', 'g') AS label,
  CAST(length(text) AS BIGINT) AS text_len,
  regexp_replace(
    CASE WHEN regexp_matches(regexp_replace(tool, '^$', 'none'),
                             '^(calc|python|shell)')
         THEN 'compute' END, 'zzz$', 'qqq', 'g') AS tool_kind,
  regexp_replace(upper(role), 'zzz$', 'qqq', 'g') AS role_up,
  CAST(hour(ts) AS BIGINT) AS ts_hour,
  CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix,
  date_trunc('hour', ts) AS ts_trunc,
  strftime(ts, '%Y-%m-%d') AS ts_fmt,
  CAST(minute(ts) AS BIGINT) AS ts_min,
  CAST(day(ts) AS BIGINT) AS ts_day,
  CAST(month(ts) AS BIGINT) AS ts_mon,
  CAST(year(ts) AS BIGINT) AS ts_year,
  epoch_ms(ts) AS ts_ms,
  epoch_ns(ts) AS ts_ns,
  CASE WHEN role = 'user' THEN 'keep' ELSE 'fill' END AS m1_a,
  'new' AS m1_b,
  'fill' AS m2_a,
  'new' AS m2_b,
  'fill' AS m3_a,
  'vqqq' AS probe2,
  md5(regexp_replace(left(text, 40), 'zzz$', 'qqq', 'g')) AS text_md5,
  sha256(regexp_replace(conv_id, 'zzz$', 'qqq', 'g')) AS conv_sha,
  CAST(turn_idx AS VARCHAR) AS turn_s,
  'dp' AS "attributes.custom_dp_attr",
  'res' AS "resource.attributes.custom_res_attr",
  'scope' AS "instrumentation_scope.attributes.custom_scope_attr",
  'dp-dependent' AS "resource.attributes.dependent_attr",
  regexp_replace(role, 'zzz$', 'qqq', 'g') AS "attributes.role_attr"
FROM transcripts
"""


def apply_statements(
    ds: rd.Dataset, statements: Sequence[str]
) -> rd.Dataset:
    """Compile a statement list once and apply it in order inside one
    fused ``map_batches`` (the post-aggregation decoration hook,
    lsmintervalprocessor processor.go:556-605)."""
    fns = [parse_statement(s) for s in statements]
    if not fns:
        return ds

    def run(t: pa.Table) -> pa.Table:
        for fn in fns:
            t = fn(t)
        return t

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Stage registry
# ---------------------------------------------------------------------------

StageFn = Callable[..., rd.Dataset]
"""Stage callable contract: ``PipelineSpec.build`` invokes a stage as
``fn(ds, batch_size)`` — and the stage named ``"route"`` as
``fn(ds, router, batch_size)``.  :func:`register_stage` adapts plain
``fn(ds)`` callables automatically (extra build arguments are dropped),
so user stages may ignore tuning parameters they don't need."""

_REGISTRY: Dict[str, StageFn] = {}


def _adapt_stage(fn: StageFn) -> StageFn:
    """Wrap a callable that only accepts (ds) so build-time extras
    (batch_size, router) don't TypeError — the round-1 advice finding:
    the declared Callable[[Dataset], Dataset] contract crashed at build
    time."""
    import inspect

    try:
        params = list(inspect.signature(fn).parameters.values())
    except (TypeError, ValueError):
        return fn
    pos = [
        p
        for p in params
        if p.kind
        in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.VAR_POSITIONAL)
    ]
    if any(p.kind == p.VAR_POSITIONAL for p in pos) or len(pos) >= 3:
        return fn
    if len(pos) == 2:

        def two_arg(ds, *extras):
            return fn(ds, extras[-1] if extras else None)

        return two_arg

    def one_arg(ds, *extras):
        return fn(ds)

    return one_arg


def register_stage(name: str, fn: StageFn) -> None:
    if name in _REGISTRY:
        raise ValueError(f"stage {name!r} already registered")
    _REGISTRY[name] = _adapt_stage(fn)


def get_stage(name: str) -> StageFn:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def _register_builtins() -> None:
    from ..stages.enrich import enrich_stage
    from ..stages.parse import parse_stage
    from ..stages.route import route_stage

    if "parse" not in _REGISTRY:
        _REGISTRY["parse"] = parse_stage
        _REGISTRY["enrich"] = enrich_stage
        _REGISTRY["route"] = route_stage


# ---------------------------------------------------------------------------
# PipelineSpec
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PipelineSpec:
    """Declarative pipeline: stage names + router + aggregation config.

    Validation happens at construction (fail fast, like component
    Validate() in the reference), not at execution.
    """

    stages: Tuple[str, ...] = ("parse", "enrich", "route")
    router: RouterConfig = field(default_factory=RouterConfig)
    intervals: Tuple[str, ...] = ("1h", "24h")
    statements: Tuple[str, ...] = ()
    batch_size: int = 65536

    def __post_init__(self):
        _register_builtins()
        for s in self.stages:
            get_stage(s)
        validate_intervals(self.intervals)
        for stmt in self.statements:
            parse_statement(stmt)

    @classmethod
    def from_dict(cls, cfg: dict) -> "PipelineSpec":
        """Build a spec from plain config data (parsed YAML/JSON) —
        the integration-template entry point
        (receiver/integrationreceiver/README.md:17-25): templates are
        data; validation still happens in __post_init__."""
        allowed = {"stages", "intervals", "statements", "batch_size"}
        unknown = set(cfg) - allowed
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        kwargs = {}
        for key in ("stages", "intervals", "statements"):
            if key in cfg:
                kwargs[key] = tuple(cfg[key])
        if "batch_size" in cfg:
            kwargs["batch_size"] = int(cfg["batch_size"])
        return cls(**kwargs)

    def build(self, ds: rd.Dataset) -> rd.Dataset:
        _register_builtins()
        for s in self.stages:
            fn = get_stage(s)
            if s == "route":
                ds = fn(ds, self.router, self.batch_size)
            else:
                ds = fn(ds, self.batch_size)
        return ds

    def aggregate(self, ds: rd.Dataset) -> rd.Dataset:
        from ..stages.aggregate import service_summary

        out = service_summary(ds, self.intervals, self.batch_size * 2)
        return apply_statements(out, self.statements)


# ---------------------------------------------------------------------------
# YAML front end (round-4 item): the integration receiver's
# templated-YAML instantiation (receiver/integrationreceiver/
# README.md:17-25, pkg/integrations/integrations.go) over the existing
# PipelineSpec/registry mechanism.
# ---------------------------------------------------------------------------


def render_template(text: str, variables: Dict[str, str]) -> str:
    """``{{var}}`` substitution over a template string, mirroring the
    integration templates' parameter resolve (pkg/integrations):
    whitespace inside the braces is tolerated; an unreferenced
    variable is fine, an unresolved placeholder raises (the reference
    fails the template render loudly)."""

    def sub(m: "re.Match[str]") -> str:
        name = m.group(1).strip()
        if name not in variables:
            raise ValueError(
                f"template variable {name!r} not provided "
                f"(have: {sorted(variables)})"
            )
        return str(variables[name])

    return re.sub(r"\{\{([^{}]+)\}\}", sub, text)


def load_pipeline_yaml(
    path: str, variables: Dict[str, str] | None = None
) -> PipelineSpec:
    """Load a :class:`PipelineSpec` from a templated YAML file.

    Layout (both top-level keys optional except ``pipeline``)::

        parameters:        # template defaults, overridable by caller
          tier_interval: 1h
        pipeline:
          stages: [parse, enrich, route]
          intervals: ["{{tier_interval}}", 24h]
          statements:
            - set(tier, "gold") where role == "assistant"
          batch_size: 65536

    Resolution order mirrors the reference's two-phase template
    instantiation: the ``parameters`` block supplies defaults, caller
    ``variables`` override them, then the WHOLE document is
    re-rendered with the merged set and parsed again — so templates
    may appear anywhere in the pipeline block (quote them where YAML
    needs it).  Validation is PipelineSpec's own (__post_init__), so a
    bad stage name / interval / statement fails at load time."""
    import yaml

    with open(path) as f:
        raw = f.read()
    defaults: Dict[str, str] = {}
    try:
        pre = yaml.safe_load(raw)
        if isinstance(pre, dict) and isinstance(
            pre.get("parameters"), dict
        ):
            defaults = dict(pre["parameters"])
    except yaml.YAMLError:
        # templates outside quoted scalars can make the raw document
        # unparseable — then ALL variables must come from the caller
        pass
    merged = {**defaults, **(variables or {})}
    doc = yaml.safe_load(render_template(raw, merged))
    if not isinstance(doc, dict) or "pipeline" not in doc:
        raise ValueError(f"{path}: expected a top-level 'pipeline' key")
    return PipelineSpec.from_dict(doc["pipeline"])
