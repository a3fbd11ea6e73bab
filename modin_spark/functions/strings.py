"""String accessor ops as JVM-side Spark expressions.

Covers the reference's ``str_*`` surface
(/root/reference/modin/core/storage_formats/pandas/query_compiler.py:2129-2225
— each is ``Map.register(_str_map("<name>"))`` over pandas.Series.str) with
built-in ``pyspark.sql.functions`` — no Python UDFs in this module, so every
op stays inside whole-stage codegen.

Each entry: name -> callable(Column, **kwargs) -> Column.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _strip(c: Column, to_strip=None, side="both") -> Column:
    if to_strip is None:
        fn = {"both": F.trim, "left": F.ltrim, "right": F.rtrim}[side]
        return fn(c)
    pat = re.escape(to_strip)
    if side in ("both", "left"):
        c = F.regexp_replace(c, f"^[{pat}]+", "")
    if side in ("both", "right"):
        c = F.regexp_replace(c, f"[{pat}]+$", "")
    return c


def _jp(pat: str) -> str:
    """Python -> Java regex: named groups are (?<name>)/\\k<name> in Java,
    (?P<name>)/(?P=name) in Python."""
    return pat.replace("(?P<", "(?<").replace("(?P=", r"\k<")


def _contains(c: Column, pat: str, case: bool = True, regex: bool = True, na=None, **kw) -> Column:
    if regex:
        pat = _jp(pat)
        p = pat if case else f"(?i){pat}"
        e = c.rlike(p)
    elif not case:
        e = F.instr(F.lower(c), pat.lower()) > 0
    else:
        e = F.instr(c, pat) > 0
    # pandas na=: fill result for missing input values
    return F.coalesce(e, F.lit(na)) if na is not None else e


def _rsplit(c: Column, pat=None, n=-1) -> Column:
    """pandas rsplit: splits from the RIGHT when n>0. Reverse the string,
    split on the reversed separator with limit n+1, then un-reverse each
    piece and the piece order — pure codegen, no UDF."""
    sep = pat if pat else None
    if not n or n <= 0:
        return F.split(c, re.escape(sep) if sep else r"\s+")
    if sep is None:
        rpat = r"\s+"
    else:
        rpat = re.escape(sep[::-1])
    parts = F.split(F.reverse(c), rpat, n + 1)
    return F.reverse(F.transform(parts, lambda x: F.reverse(x)))


def _replace(c: Column, pat: str, repl: str, regex: bool = True, case: bool = True, **kw) -> Column:
    if regex:
        p = pat if case else f"(?i){pat}"
        return F.regexp_replace(c, p, repl)
    if not case:  # case-insensitive literal -> escaped regex with (?i)
        return F.regexp_replace(c, f"(?i){re.escape(pat)}", repl.replace("\\", "\\\\").replace("$", "\\$"))
    # literal replace
    return F.replace(c, F.lit(pat), F.lit(repl))


def _slice(c: Column, start=None, stop=None, step=None) -> Column:
    if step not in (None, 1):
        # step slicing: split to a char array, keep indexes in the slice
        # with (i - start) % step == 0, re-join — stays a codegen projection
        s0 = 0 if start is None else start
        chars = F.split(c, "")
        ln = F.size(chars)
        sx = F.lit(s0) if s0 >= 0 else F.greatest(ln + F.lit(s0), F.lit(0))
        ex = (F.lit(2**31 - 1) if stop is None
              else (F.lit(stop) if stop >= 0 else F.greatest(ln + F.lit(stop), F.lit(0))))
        kept = F.filter(
            chars,
            lambda ch, i: (i >= sx) & (i < ex) & ((i - sx) % F.lit(step) == 0),
        )
        return F.when(c.isNotNull(), F.concat_ws("", kept))
    start = 0 if start is None else start
    if start >= 0:
        begin = start + 1
        if stop is None:
            return F.substring(c, begin, 2**31 - 1)
        length = F.greatest(F.lit(stop - start), F.lit(0))
        return F.substring(c, F.lit(begin), length)
    # negative start: compute from length
    ln = F.length(c)
    begin = F.greatest(ln + F.lit(start), F.lit(0))
    stop_pos = ln if stop is None else (F.lit(stop) if stop >= 0 else ln + F.lit(stop))
    length = F.greatest(stop_pos - begin, F.lit(0))
    return F.substring(c, begin + 1, length)


def _getitem(c: Column, i: int) -> Column:
    out = _slice(c, i, i + 1 if i != -1 else None)
    return F.when(F.length(out) == 0, F.lit(None)).otherwise(out)


def _pad(c: Column, width: int, side: str = "left", fillchar: str = " ") -> Column:
    ln = F.length(c)
    if side == "left":
        return F.when(ln >= width, c).otherwise(F.lpad(c, width, fillchar))
    if side == "right":
        return F.when(ln >= width, c).otherwise(F.rpad(c, width, fillchar))
    # both: CPython's str.center rule — left = marg//2 + (marg & width & 1),
    # i.e. the extra fill char goes LEFT only when margin AND width are both
    # odd, RIGHT otherwise (pandas delegates to it)
    marg = F.lit(width) - ln
    left = F.floor(marg / 2) + F.pmod(marg, F.lit(2)) * F.lit(width % 2)
    return F.when(ln >= width, c).otherwise(
        F.rpad(F.lpad(c, (ln + left).cast("int"), fillchar), width, fillchar)
    )


def _rpartition(c: Column, sep: str = " ") -> Column:
    """Split on the LAST occurrence: (head, sep, tail) struct."""
    pos = F.length(c) - F.instr(F.reverse(c), F.reverse(F.lit(sep))) - len(sep) + 1
    found = F.instr(F.reverse(c), F.reverse(F.lit(sep))) > 0
    head = F.when(found, F.substring(c, 1, pos)).otherwise(F.lit(""))
    tail = F.when(found, F.substring(c, pos + len(sep) + 1, 2**31 - 1)).otherwise(c)
    mid = F.when(found, F.lit(sep)).otherwise(F.lit(""))
    null3 = F.array(F.lit(None).cast("string"), F.lit(None).cast("string"), F.lit(None).cast("string"))
    return F.when(c.isNull(), null3).otherwise(F.array(head, mid, tail))


def _partition(c: Column, sep: str = " ") -> Column:
    idx = F.instr(c, sep)
    null3 = F.array(F.lit(None).cast("string"), F.lit(None).cast("string"), F.lit(None).cast("string"))
    return F.when(c.isNull(), null3).when(
        idx > 0,
        F.array(
            F.substring(c, 1, idx - 1),
            F.lit(sep),
            F.substring(c, idx + len(sep), 2**31 - 1),
        ),
    ).otherwise(F.array(c, F.lit(""), F.lit("")))


_ALPHA = r"^[\p{L}]+$"



def _title(c: Column) -> Column:
    """pandas title: uppercase after ANY non-letter (initcap only splits on
    whitespace) — a per-char transform with a previous-char boundary check,
    still whole-stage codegen."""
    chars = F.split(c, "")
    return F.when(c.isNotNull(), F.concat_ws("", F.transform(
        chars,
        lambda ch, i: F.when(i == 0, F.upper(ch)).otherwise(
            F.when(~F.element_at(chars, i).rlike(r"\p{L}"), F.upper(ch)).otherwise(F.lower(ch))
        ),
    )))


def _swapcase(c: Column) -> Column:
    chars = F.split(c, "")
    return F.when(c.isNotNull(), F.concat_ws("", F.transform(
        chars,
        lambda ch: F.when((ch == F.upper(ch)) & (ch != F.lower(ch)), F.lower(ch))
                    .when((ch == F.lower(ch)) & (ch != F.upper(ch)), F.upper(ch))
                    .otherwise(ch),
    )))


def _translate(c: Column, table) -> Column:
    """str.translate with a {ord: ord/str/None} table — 1:1 and deletion
    maps compile to F.translate; anything else is unsupported."""
    src_chars, dst_chars = [], []
    for k, v in table.items():
        kc = chr(k) if isinstance(k, int) else str(k)
        if v is None:
            vc = ""
        else:
            vc = chr(v) if isinstance(v, int) else str(v)
        if len(vc) > 1:
            raise NotImplementedError("str.translate with multi-char replacements")
        src_chars.append(kc)
        dst_chars.append(vc)
    return F.translate(c, "".join(src_chars), "".join(dst_chars))


def _wrap(c: Column, width: int) -> Column:
    """textwrap line filling is STATEFUL (a broken long word fills the
    remainder of the current line before wrapping), not expressible as a
    regex/codegen projection — the one Arrow-batched pandas UDF in this
    module, running exactly what pandas runs per row (pandas .str.wrap
    delegates to textwrap.TextWrapper)."""
    from pyspark.sql.functions import pandas_udf

    _do = pandas_udf(lambda s: s.str.wrap(width), "string")
    return _do(c)


def _any_affix(c, pat, which: str):
    """startswith/endswith with a str or tuple-of-str pattern (pandas)."""
    pats = pat if isinstance(pat, (tuple, list, set)) else [pat]
    e = None
    for p in pats:
        t = getattr(c, which)(p)
        e = t if e is None else (e | t)
    if e is None:
        # pandas: s.str.startswith(()) is valid and all-False (null-safe —
        # callers wrap in F.coalesce(e, na), which would choke on None)
        return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(F.lit(False))
    return e


STR_FUNCS = {
    "lower": lambda c: F.lower(c),
    "upper": lambda c: F.upper(c),
    "title": _title,
    "capitalize": lambda c: F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2**31 - 1))),
    "swapcase": _swapcase,
    "len": lambda c: F.length(c),
    "strip": lambda c, to_strip=None: _strip(c, to_strip, "both"),
    "lstrip": lambda c, to_strip=None: _strip(c, to_strip, "left"),
    "rstrip": lambda c, to_strip=None: _strip(c, to_strip, "right"),
    "contains": _contains,
    # pandas accepts a tuple of prefixes/suffixes (any-match)
    "startswith": lambda c, pat, na=None: F.coalesce(
        _any_affix(c, pat, "startswith"), F.lit(na)),
    "endswith": lambda c, pat, na=None: F.coalesce(
        _any_affix(c, pat, "endswith"), F.lit(na)),
    "find": lambda c, sub, start=0, end=None: F.instr(c, sub) - 1,
    "rfind": lambda c, sub: F.when(
        F.instr(F.reverse(c), F.reverse(F.lit(sub))) > 0,
        F.length(c) - F.instr(F.reverse(c), F.reverse(F.lit(sub))) - len(sub) + 1,
    ).otherwise(F.when(c.isNotNull(), F.lit(-1))),
    "replace": _replace,
    "repeat": lambda c, repeats: F.repeat(c, repeats),
    # pandas n = max SPLITS; Spark limit = max ELEMENTS = n+1
    "split": lambda c, pat=None, n=-1, regex=None: F.split(
        c, (pat if (regex or pat is None) else re.escape(pat)) if pat is not None else r"\s+", n + 1 if n and n > 0 else -1
    ),
    "rsplit": _rsplit,
    "slice": _slice,
    "__getitem__": _getitem,
    "get": _getitem,
    "zfill": lambda c, width: F.when(F.length(c) >= width, c).when(
        c.startswith("-"),
        F.concat(F.lit("-"), F.lpad(F.substring(c, 2, 2**31 - 1), width - 1, "0")),
    ).otherwise(F.lpad(c, width, "0")),
    "pad": _pad,
    "center": lambda c, width, fillchar=" ": _pad(c, width, "both", fillchar),
    "ljust": lambda c, width, fillchar=" ": _pad(c, width, "right", fillchar),
    "rjust": lambda c, width, fillchar=" ": _pad(c, width, "left", fillchar),
    "count": lambda c, pat, flags=0: F.regexp_count(c, F.lit(_jp(pat))),
    "match": lambda c, pat, case=True, na=None: c.rlike(f"^(?:{_jp(pat)})" if case else f"(?i)^(?:{_jp(pat)})"),
    "fullmatch": lambda c, pat, case=True, na=None: c.rlike(f"^(?:{_jp(pat)})$" if case else f"(?i)^(?:{_jp(pat)})$"),
    "extract": lambda c, pat, group=1: F.when(c.rlike(_jp(pat)), F.regexp_extract(c, _jp(pat), group)),
    # idx=1 when the pattern has exactly one group (pandas returns the group),
    # else 0 (full match) — Spark's default idx=1 errors on group-free patterns
    "findall": lambda c, pat: F.regexp_extract_all(
        c, F.lit(_jp(pat)), 1 if __import__("re").compile(pat).groups == 1 else 0
    ),
    "partition": _partition,
    "rpartition": lambda c, sep=" ": _rpartition(c, sep),
    "rindex": lambda c, sub: F.length(c) - F.instr(F.reverse(c), F.reverse(F.lit(sub))) - len(sub) + 1,
    "isalpha": lambda c: c.rlike(r"^[\p{L}]+$"),
    "isdigit": lambda c: c.rlike(r"^[\p{Nd}]+$"),
    "isdecimal": lambda c: c.rlike(r"^[\p{Nd}]+$"),
    "isnumeric": lambda c: c.rlike(r"^[\p{N}]+$"),
    "isalnum": lambda c: c.rlike(r"^[\p{L}\p{N}]+$"),
    "isspace": lambda c: c.rlike(r"^\s+$"),
    "islower": lambda c: c.rlike(r"^[^\p{Lu}]*[\p{Ll}][^\p{Lu}]*$"),
    "isupper": lambda c: c.rlike(r"^[^\p{Ll}]*[\p{Lu}][^\p{Ll}]*$"),
    # Python str.istitle: leading non-letters allowed; every letter RUN is
    # [Lu][Ll]* and at least one run exists
    "istitle": lambda c: c.rlike(r"^(?:[^\p{L}]*[\p{Lu}][\p{Ll}]*(?=[^\p{L}]|$))+[^\p{L}]*$"),
    "removeprefix": lambda c, prefix: F.when(c.startswith(prefix), F.substring(c, len(prefix) + 1, 2**31 - 1)).otherwise(c),
    "removesuffix": lambda c, suffix: F.when(c.endswith(suffix), F.substring(c, 1, F.length(c) - len(suffix))).otherwise(c),
    "cat": lambda c, others=None, sep="": F.concat_ws(sep, c, *(others or [])),
    "join": lambda c, sep: F.array_join(c, sep),
    "translate": _translate,
    "encode": lambda c, encoding="utf-8": F.encode(c, encoding),
    "decode": lambda c, encoding="utf-8": F.decode(c, encoding),
    "normalize": lambda c, form: c,
    "casefold": lambda c: F.lower(c),
    "index": lambda c, sub: F.instr(c, sub) - 1,
    "slice_replace": lambda c, start=None, stop=None, repl="": F.concat(
        F.substring(c, 1, (start or 0)), F.lit(repl), F.substring(c, (stop or 0) + 1, 2**31 - 1)
    ),
    "wrap": lambda c, width: _wrap(c, width),
}


def str_func(name: str, c: Column, *args, **kwargs) -> Column:
    fn = STR_FUNCS.get(name)
    if fn is None:
        raise NotImplementedError(f"str.{name}")
    return fn(c, *args, **kwargs)
