"""String / datetime accessors (reference: xarray/core/accessor_str.py:209,
accessor_dt.py:321).

Each method is a columnar transform of the single data var of an
XDataArray — JVM-side builtin functions (codegen'd) except
``str.normalize``, which needs unicodedata and uses an Arrow-batched
pandas UDF.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import Column
from pyspark.sql import functions as F

from xarray_spark.dataset import XDataArray


def _freq_us(n: int, unit: str, subsec_us, trunc_map) -> int | None:
    """Fixed-width frequency → exact integer microseconds (None for
    calendar-width units, where ceil/round have no constant step)."""
    if unit in subsec_us:
        return n * subsec_us[unit]
    secs = {"second": 1, "minute": 60, "hour": 3600,
            "day": 86400}.get(trunc_map.get(unit, ""))
    return None if secs is None else n * secs * 1_000_000


class _Accessor:
    def __init__(self, da: XDataArray):
        self.da = da
        #: when True, _wrap returns the raw Column instead of a wrapped
        #: XDataArray — fields() uses it to compose several accessor
        #: results into ONE projection
        self._expr_mode = False

    def fields(self, *names: str, **named: str):
        """One-pass MULTI-field projection (engine extension — round-10
        verdict #3): ``ds['lag'].dt.fields('days', 'total_seconds')``
        returns an XDataset with one data var per requested field, all
        computed in a single SELECT over the source frame.  Without
        this, a query needing two accessor fields had to materialize
        two branches and re-join them on a row id — double the join
        work, and ``monotonically_increasing_id`` as an equi-join key
        between branches of one lineage is a cluster-scale hazard
        (renumbering under task retry).  Keywords rename:
        ``fields(lag_days='days', lag_secs='total_seconds')``.  Only
        no-argument fields/methods qualify (strftime/floor/… take
        parameters — call them individually)."""
        from xarray_spark.dataset import XDataset
        req = {n: n for n in names}
        req.update(named)
        if not req:
            raise ValueError("fields() needs at least one field name")
        da = self.da
        exprs = []
        for alias, f in req.items():
            self._expr_mode = True
            try:
                v = getattr(self, f)
                if callable(v):
                    v = v()
            finally:
                self._expr_mode = False
            if not isinstance(v, Column):
                raise TypeError(
                    f"accessor field {f!r} is not a column-producing "
                    "no-argument field")
            exprs.append(v.alias(alias))
        clash = set(req) & (set(da.dims) | set(da.coords))
        if clash:
            raise ValueError(
                f"fields() output names {sorted(clash)} collide with "
                "dims/coords — rename via keyword form, e.g. "
                "fields(lag_days='days')")
        keep = list(da.dims) + list(da.coords)
        df = da.df.select(*keep, *exprs)
        return XDataset(df, da.dims, da.coords, list(req), da.attrs)

    def _wrap(self, expr: Column, name: str | None = None) -> XDataArray:
        if self._expr_mode:
            return expr
        da = self.da
        out = name or da.name
        if out in da.dims or (out in da.coords and out not in da.data_vars):
            # accessor on a dim/coord-named array (da.dt on the index
            # itself): suffix the result so the dim column survives
            out = f"{out}_"
        df = da.df.withColumn(out, expr)
        cols = list(da.dims) + list(da.coords) + [out]
        return XDataArray(df.select(*cols), da.dims, da.coords, [out], da.attrs)

    @property
    def _c(self) -> Column:
        return F.col(self.da.name)


class StringAccessor(_Accessor):
    """~60 vectorized string methods (xarray/core/accessor_str.py)."""

    def len(self): return self._wrap(F.length(self._c))
    def lower(self): return self._wrap(F.lower(self._c))
    def upper(self): return self._wrap(F.upper(self._c))
    def title(self):
        # Python str.title uppercases the FIRST letter of every letter
        # run and lowercases the rest — ANY non-letter is a word
        # boundary, not just whitespace (initcap gave 'Zz-top' for
        # 'ZZ-top' where Python gives 'Zz-Top' — wave-50 fuzz find).
        # Sequential char fold with a prev-is-letter flag; strings are
        # row-local and title isn't a hot-path op.
        name = self.da.name
        is_l = "ch RLIKE '^\\\\p{L}$'"
        return self._wrap(F.expr(
            f"aggregate(split({name}, ''), "
            f"struct(CAST('' AS STRING) AS acc, false AS prev), "
            f"(st, ch) -> struct(concat(st.acc, "
            f"CASE WHEN {is_l} AND NOT st.prev THEN upper(ch) "
            f"WHEN {is_l} THEN lower(ch) ELSE ch END), "
            f"{is_l}), st -> st.acc)"))
    def capitalize(self):
        return self._wrap(F.concat(F.upper(F.substring(self._c, 1, 1)), F.lower(F.expr(f"substring({self.da.name}, 2)"))))
    def swapcase(self):
        # no builtin; char-level transform stays JVM-side via translate-less expr
        c = self._c
        return self._wrap(
            F.expr(
                f"concat_ws('', transform(split({self.da.name}, ''), "
                "ch -> CASE WHEN ch = upper(ch) THEN lower(ch) ELSE upper(ch) END))"
            )
        )
    def strip(self, to_strip: str | None = None):
        return self._wrap(F.trim(self._c) if to_strip is None else F.expr(f"trim(BOTH '{to_strip}' FROM {self.da.name})"))
    def lstrip(self): return self._wrap(F.ltrim(self._c))
    def rstrip(self): return self._wrap(F.rtrim(self._c))
    def get(self, i: int, default: str = ""):
        """Character at position i, Python indexing incl. negative;
        out-of-range → default (reference accessor_str.py:324)."""
        c = self._c
        if i >= 0:
            ch = F.substring(c, i + 1, 1)
        else:
            ch = F.when(F.length(c) >= -i, F.substring(c, i, 1)) \
                 .otherwise(F.lit(""))
        return self._wrap(F.when(ch == "", F.lit(default)).otherwise(ch))

    def slice(self, start=None, stop=None, step=None):
        """Python slice semantics per element — negative indices, both
        defaults, and step (reference accessor_str.py:356).  step==1 is
        one substring; other steps walk an index sequence, still fully
        JVM-side."""
        c = self._c
        L = F.length(c)
        stp = 1 if step is None else int(step)
        if stp == 0:
            raise ValueError("slice step cannot be zero")

        def norm(idx, default, lo_clamp, hi_clamp):
            # Python slice.indices(): negatives offset from the end,
            # then clamp into [lo_clamp, hi_clamp]
            if idx is None:
                return default
            if idx < 0:
                return F.greatest(L + idx, lo_clamp)
            return F.least(F.lit(idx), hi_clamp)

        if stp > 0:
            s = norm(start, F.lit(0), F.lit(0), L)
            e = norm(stop, L, F.lit(0), L)
            if stp == 1:
                ln = F.greatest(e - s, F.lit(0))
                return self._wrap(
                    F.substring(c, (s + 1).cast("int"), ln.cast("int")))
            idx = F.when(e > s, F.sequence(
                s.cast("int"), (e - 1).cast("int"), F.lit(stp))
            ).otherwise(F.array().cast("array<int>"))
        else:
            s = norm(start, L - 1, F.lit(-1), L - 1)
            e = norm(stop, F.lit(-1), F.lit(-1), L - 1)
            idx = F.when(s > e, F.sequence(
                s.cast("int"), (e + 1).cast("int"), F.lit(stp))
            ).otherwise(F.array().cast("array<int>"))
        picked = F.transform(idx, lambda i: F.substring(c, i + F.lit(1), F.lit(1)))
        return self._wrap(F.array_join(picked, ""))
    def startswith(self, pat: str): return self._wrap(self._c.startswith(pat))
    def endswith(self, pat: str): return self._wrap(self._c.endswith(pat))
    def contains(self, pat: str, case: bool = True, regex: bool = True):
        if not case:
            if regex:
                return self._wrap(self._c.rlike(f"(?i){pat}"))
            return self._wrap(F.lower(self._c).contains(pat.lower()))
        return self._wrap(self._c.rlike(pat) if regex else self._c.contains(pat))
    def match(self, pat: str): return self._wrap(self._c.rlike(f"^{pat}"))
    def count(self, pat: str):
        # column-API form: embedding pat in a SQL literal would mangle
        # backslash classes like \d
        return self._wrap(F.regexp_count(self._c, F.lit(pat)))
    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            return self._wrap(F.regexp_replace(self._c, pat, repl))
        return self._wrap(F.replace(self._c, F.lit(pat), F.lit(repl)))
    @staticmethod
    def _flagged(pat: str, case, flags: int) -> str:
        """Translate re flags / case= to Java inline-flag prefixes
        (reference accessor_str.py compiles with re.compile(pat,
        flags) — IGNORECASE/DOTALL/MULTILINE map 1:1 to (?i)(?s)(?m))."""
        import re as _re
        parts = ""
        if flags:
            known = _re.IGNORECASE | _re.DOTALL | _re.MULTILINE
            if flags & ~known:
                raise NotImplementedError(
                    "only IGNORECASE/DOTALL/MULTILINE flags are "
                    "supported in the Spark regex engine")
            if flags & _re.IGNORECASE:
                parts += "i"
            if flags & _re.DOTALL:
                parts += "s"
            if flags & _re.MULTILINE:
                parts += "m"
        if case is False and "i" not in parts:
            parts += "i"
        return (f"(?{parts})" if parts else "") + pat

    def extract(self, pat: str, dim=None, case: bool | None = None,
                flags: int = 0, group: int | None = None):
        """First match's capture groups (xarray accessor_str.py:1871
        extract): ``dim=None`` requires exactly ONE group and returns a
        same-dims array ('' where unmatched); ``dim=name`` adds a new
        dim of size n_groups holding each group of the FIRST match.
        ``group=`` is a non-reference extension selecting one group
        index directly."""
        import re as _re
        if group is not None:
            return self._wrap(F.regexp_extract(self._c, pat, group))
        n = _re.compile(pat).groups
        if n == 0:
            raise ValueError("No capture groups found in pattern.")
        jpat = self._flagged(pat, case, flags)
        if dim is None:
            if n > 1:
                raise ValueError(
                    "Dimension must be specified if more than one "
                    "capture group is given.")
            return self._wrap(F.regexp_extract(self._c, jpat, 1))
        da = self.da
        groups = F.array(*[F.regexp_extract(self._c, jpat, g)
                           for g in range(1, n + 1)])
        df = da.df.select(
            *da.dims, F.posexplode(groups).alias(dim, da.name))
        from xarray_spark.dataset import XDataArray
        return XDataArray(df, list(da.dims) + [dim], {}, [da.name],
                          da.attrs)
    def findall(self, pat: str):
        """All matches as an array (pandas str.findall): a groupless
        pattern returns full matches (regexp_extract_all needs a
        capture group, so one is wrapped on); a 1-group pattern returns
        that group's matches."""
        import re as _re
        ngroups = _re.compile(pat).groups
        if ngroups == 0:
            pat, idx = f"({pat})", 1
        elif ngroups == 1:
            idx = 1
        else:
            raise NotImplementedError(
                "findall with >1 capture group returns tuples in "
                "pandas — no array<struct> rendering here")
        return self._wrap(
            F.regexp_extract_all(self._c, F.lit(pat), F.lit(idx)))
    def split(self, sep: str | None = None, regex: bool = False,
              maxsplit: int = -1):
        """Split into an array column.  ``sep=None`` is Python
        whitespace splitting (runs collapse, empty → []); the reference
        API puts a new-dim name first (accessor_str.py:2536) — long
        form keeps the array column instead (documented divergence)."""
        c = self._c
        if sep is None:
            t = F.trim(c)
            parts = F.when(t == "", F.array().cast("array<string>")) \
                     .otherwise(F.split(t, "\\s+"))
            joiner = " "
        else:
            pat = sep if regex else "\\Q" + sep + "\\E"
            parts = F.split(c, pat)
            joiner = sep if not regex else " "
        if maxsplit >= 0:
            n = F.size(parts)
            merged = F.array_join(
                F.slice(parts, maxsplit + 1,
                        F.greatest(n - maxsplit, F.lit(0))), joiner)
            parts = F.when(n <= maxsplit + 1, parts).otherwise(
                F.concat(F.slice(parts, 1, maxsplit), F.array(merged)))
        return self._wrap(parts)
    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        """No-truncate padding: Spark's lpad/rpad TRUNCATE strings
        longer than width; Python's rjust/ljust/center (what the
        reference accessor_str.py:1424 delegates to) never do."""
        c = self._c
        if side == "left":
            filled = F.lpad(c, width, fillchar)
        elif side == "right":
            filled = F.rpad(c, width, fillchar)
        else:  # both = str.center: left margin is marg//2 + (marg&width&1)
            marg = F.lit(width) - F.length(c)
            left = F.floor(marg / 2) + (marg % 2) * F.lit(width % 2)
            filled = F.rpad(F.lpad(c, (F.length(c) + left).cast("int"),
                                   fillchar), width, fillchar)
        return self._wrap(F.when(F.length(c) >= width, c).otherwise(filled))
    def zfill(self, width: int): return self.pad(width, "left", "0")
    def ljust(self, width: int, fillchar: str = " "): return self.pad(width, "right", fillchar)
    def rjust(self, width: int, fillchar: str = " "): return self.pad(width, "left", fillchar)
    def repeat(self, n: int): return self._wrap(F.repeat(self._c, n))
    def translate(self, frm, to: str | None = None):
        """Two forms: SQL-style (frm, to) char maps → F.translate; the
        reference's dict table (accessor_str.py:1673, str.translate
        semantics incl. deletions and multi-char targets) → Arrow UDF."""
        if to is not None:
            return self._wrap(F.translate(self._c, frm, to))
        table = {}
        for k, v in dict(frm).items():
            key = k if isinstance(k, int) else ord(k)
            table[key] = v
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _tr(s: pd.Series) -> pd.Series:
            return s.map(lambda x: x.translate(table) if x is not None else None)

        return self._wrap(_tr(self._c))
    def cat(self, *others, sep: str = ""):
        """Elementwise concatenation (reference accessor_str.py cat):
        plain-string operands are LITERALS broadcast to every element,
        array operands concatenate elementwise (aligned on the shared
        dims via join when they come from another frame); varargs
        chain left to right."""
        from pyspark.sql import Column as _Col
        base = self.da
        cols = [self._c]
        for i, o in enumerate(others):
            if isinstance(o, str):
                cols.append(F.lit(o))
            elif isinstance(o, _Col):
                cols.append(o)
            else:
                # XDataArray/XDataset operand: align onto this frame
                tmp = f"__cat_{i}"
                base = base.assign(**{tmp: o})
                cols.append(F.col(tmp))
        expr = F.concat_ws(sep, *cols)
        da = self.da
        out = da.name
        # result shape comes from the POST-assign frame: an operand
        # carrying dims the base lacks broadcasts the frame along
        # them (reference semantics — the result GAINS the dim), so
        # the extra dim columns must survive into the result or the
        # declared dims would key duplicate rows (round-9 ADVICE #2)
        if out in base.dims or (out in base.coords
                                and out not in base.data_vars):
            out = f"{out}_"
        df = base.df.withColumn(out, expr)
        keep = list(base.dims) + list(base.coords) + [out]
        return XDataArray(df.select(*keep), base.dims, base.coords,
                          [out], da.attrs)
    # Unicode character classes via Java regex properties (Python's
    # str predicates are Unicode-aware; [A-Za-z0-9] is not).  The
    # superscript/subscript digits are spelled out — Python isdigit
    # includes Numeric_Type=Digit code points that \p{Nd} misses.
    # Known approximation: ideographic numerals (Numeric_Type on Lo
    # chars, e.g. 一) count for Python isnumeric but not \p{N}.
    _SUPSUB = "²³¹⁰-⁹₀-₉"
    def isalpha(self): return self._wrap(self._c.rlike("^\\p{L}+$"))
    def isdigit(self): return self._wrap(self._c.rlike(f"^[\\p{{Nd}}{self._SUPSUB}]+$"))
    def isdecimal(self): return self._wrap(self._c.rlike("^\\p{Nd}+$"))
    def isalnum(self): return self._wrap(self._c.rlike(f"^[\\p{{L}}\\p{{N}}{self._SUPSUB}]+$"))
    def isspace(self): return self._wrap(self._c.rlike("^\\s+$"))
    def isupper(self): return self._wrap((self._c == F.upper(self._c)) & self._c.rlike("\\p{L}"))
    def islower(self): return self._wrap((self._c == F.lower(self._c)) & self._c.rlike("\\p{L}"))
    def find(self, sub: str): return self._wrap(F.instr(self._c, sub) - 1)
    # (index/rindex are defined once, below, in regex-based form)
    def encode(self, charset: str = "UTF-8"): return self._wrap(F.encode(self._c, charset))
    def decode(self, charset: str = "UTF-8"): return self._wrap(F.decode(self._c, charset))
    def partition(self, sep: str):
        c, n = self._c, self.da.name
        q = "\\Q" + sep + "\\E"
        return self._wrap(
            F.struct(
                # Python partition: no separator → (whole, '', '')
                F.when(c.contains(sep), F.regexp_extract(c, f"^(.*?){q}", 1))
                 .otherwise(c).alias("head"),
                F.when(c.contains(sep), F.lit(sep)).otherwise(F.lit("")).alias("sep"),
                F.when(c.contains(sep), F.regexp_replace(c, f"^.*?{q}", "")).otherwise(F.lit("")).alias("tail"),
            )
        )
    def rpartition(self, sep: str):
        """Split on the LAST occurrence (core/accessor_str.py:2408)."""
        c = self._c
        q = "\\Q" + sep + "\\E"
        return self._wrap(
            F.struct(
                F.when(c.contains(sep), F.regexp_extract(c, f"^(.*){q}", 1)
                       ).otherwise(F.lit("")).alias("head"),
                F.when(c.contains(sep), F.lit(sep)).otherwise(F.lit("")).alias("sep"),
                F.when(c.contains(sep), F.regexp_extract(c, f".*{q}(.*)$", 1)).otherwise(c).alias("tail"),
            )
        )

    def wrap(self, width: int, **kwargs):
        """Paragraph wrap (core/accessor_str.py:1645).  The reference
        delegates to textwrap.TextWrapper — whose hyphen/whitespace
        rules a regex cannot reproduce — so this is the exact thing,
        Arrow-batched."""
        import textwrap

        from pyspark.sql.functions import pandas_udf
        tw = textwrap.TextWrapper(width=width, **kwargs)

        @pandas_udf("string")
        def _wrapf(s: pd.Series) -> pd.Series:
            return s.map(lambda x: "\n".join(tw.wrap(x)) if x is not None else None)

        return self._wrap(_wrapf(self._c))

    def normalize(self, form: str = "NFC"):
        """Unicode normalization (core/accessor_str.py:671) — no JVM
        built-in; Arrow-batched pandas UDF over unicodedata."""
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            import unicodedata
            return s.map(lambda x: unicodedata.normalize(form, x) if x is not None else None)

        return self._wrap(_norm(self._c))

    def casefold(self): return self._wrap(F.lower(self._c))

    def center(self, width: int, fillchar: str = " "):
        """Pad both sides (Python str.center — what the reference's
        pad(side='both') delegates to, accessor_str.py:1322)."""
        return self.pad(width, "both", fillchar)

    def removeprefix(self, prefix: str):
        q = "\\Q" + prefix + "\\E"
        return self._wrap(F.regexp_replace(self._c, f"^{q}", ""))

    def removesuffix(self, suffix: str):
        q = "\\Q" + suffix + "\\E"
        return self._wrap(F.regexp_replace(self._c, f"{q}$", ""))

    def rfind(self, sub: str):
        c = self._c
        q = "\\Q" + sub + "\\E"
        # last occurrence 0-indexed; -1 when absent
        tail_len = F.length(F.regexp_extract(c, f".*{q}(.*)$", 1))
        pos = F.length(c) - tail_len - len(sub)
        return self._wrap(F.when(c.contains(sub), pos).otherwise(F.lit(-1)))

    def istitle(self):
        return self._wrap(
            self._c.rlike("^([A-Z][a-z]*)(\\s+[A-Z][a-z]*)*$")
        )

    def isnumeric(self):
        # \p{N} = Nd+Nl+No (fractions, roman numerals, circled digits);
        # ideographic-numeral Lo chars are the documented approximation
        return self._wrap(self._c.rlike(f"^[\\p{{N}}{self._SUPSUB}]+$"))

    def index(self, sub: str):
        """find() that errors on absence (accessor_str.py:1793 .index) —
        raise_error keeps the check JVM-side, surfacing at action time
        like any Spark runtime error."""
        pos = F.instr(self._c, sub) - 1
        return self._wrap(
            F.when(pos >= 0, pos).otherwise(
                F.raise_error(F.concat(F.lit(f"substring {sub!r} not found in "), self._c))
            )
        )

    def rindex(self, sub: str):
        """rfind() that errors on absence (accessor_str.py:1844)."""
        q = "\\Q" + sub + "\\E"
        tail_len = F.length(F.regexp_extract(self._c, f".*{q}(.*)$", 1))
        pos = F.length(self._c) - tail_len - len(sub)
        return self._wrap(
            F.when(self._c.contains(sub), pos).otherwise(
                F.raise_error(F.concat(F.lit(f"substring {sub!r} not found in "), self._c))
            )
        )

    def join(self, dim: str | None = None, sep: str = ""):
        """Join list elements with sep (accessor_str.py:515 .join).  On
        an array column this is array_join; with a real ``dim`` it
        concatenates along that dim (collect_list ordered by the dim —
        an aggregation, the dim is consumed)."""
        from pyspark.sql import types as T
        da = self.da
        if isinstance(da.df.schema[da.name].dataType, T.ArrayType):
            return self._wrap(F.array_join(self._c, sep))
        if dim is None:
            raise ValueError("join on a scalar string column needs dim=")
        others = [d for d in da.dims if d != dim]
        joined = F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct(F.col(dim).alias("k"),
                                                             self._c.alias("v")))),
                        lambda s: s["v"]),
            sep,
        ).alias(da.name)
        df = da.df.groupBy(*others).agg(joined) if others else da.df.agg(joined)
        from xarray_spark.dataset import XDataArray
        return XDataArray(df, others, da._coords_on(others), [da.name], da.attrs)

    def rsplit(self, sep: str, maxsplit: int = -1):
        """Right-anchored split (accessor_str.py:2652): at most
        ``maxsplit`` breaks counted from the end — pure array algebra on
        the full split (slice + array_join), no Python."""
        q = "\\Q" + sep + "\\E"
        parts = F.split(self._c, q)
        if maxsplit < 0:
            return self._wrap(parts)
        n = F.size(parts)
        k = n - maxsplit  # leading parts to re-merge
        merged = F.array_join(F.slice(parts, 1, F.greatest(k, F.lit(0))), sep)
        out = F.when(n <= maxsplit + 1, parts).otherwise(
            F.concat(F.array(merged), F.slice(parts, k + 1, maxsplit))
        )
        return self._wrap(out)

    def slice_replace(self, start: int | None = None, stop: int | None = None,
                      repl: str = ""):
        """Replace positions [start, stop) with repl
        (accessor_str.py:387): substring surgery, fully codegen'd."""
        c = self._c
        s = 0 if start is None else start
        head = F.substring(c, 1, s)
        tail = F.lit("") if stop is None else F.substring(c, stop + 1, 1 << 30)
        return self._wrap(F.concat(head, F.lit(repl), tail))

    def format(self, *args, **kwargs):
        """Elementwise ``str.format`` where each ELEMENT is the template
        (accessor_str.py:586) — inherently Python string semantics, so
        this is the one .str method on the Arrow-batched pandas_udf
        path.  Array-like args (``XDataArray`` aligned on shared dims,
        or raw ``Column``) broadcast elementwise like the reference;
        plain Python values stay scalar."""
        from pyspark.sql.functions import pandas_udf

        da = self.da
        df = da.df
        arr_cols: list[Column] = []
        scalars: list = []

        def classify(v):
            nonlocal df
            if isinstance(v, XDataArray):
                tag = f"__fmt{len(arr_cols)}"
                shared = [d for d in v.dims if d in da.dims]
                side = v.df.select(*shared, F.col(v.name).alias(tag))
                df = (df.join(side, on=shared, how="inner") if shared
                      else df.crossJoin(F.broadcast(side)))
                arr_cols.append(F.col(tag))
                return ("c", len(arr_cols) - 1)
            if isinstance(v, Column):
                arr_cols.append(v)
                return ("c", len(arr_cols) - 1)
            scalars.append(v)
            return ("s", len(scalars) - 1)

        aspec = [classify(v) for v in args]
        kspec = {k: classify(v) for k, v in kwargs.items()}

        if not arr_cols:
            @pandas_udf("string")
            def _fmt0(s: pd.Series) -> pd.Series:
                return s.map(lambda t: t.format(*args, **kwargs)
                             if t is not None else None)
            return self._wrap(_fmt0(self._c))

        @pandas_udf("string")
        def _fmt(*series: pd.Series) -> pd.Series:
            tmpl = series[0]
            def one(i):
                t = tmpl.iloc[i]
                if t is None:
                    return None
                def res(spec):
                    kind, j = spec
                    return scalars[j] if kind == "s" else series[j + 1].iloc[i]
                return t.format(*[res(s) for s in aspec],
                                **{k: res(s) for k, s in kspec.items()})
            return pd.Series([one(i) for i in range(len(tmpl))])

        out = da.name
        res = df.withColumn(out, _fmt(F.col(da.name), *arr_cols))
        cols = list(da.dims) + list(da.coords) + [out]
        return XDataArray(res.select(*cols), da.dims, da.coords, [out], da.attrs)

    def get_dummies(self, dim: str | None = None, sep: str = "|"):
        """Indicator matrix per token (xarray/core/accessor_str.py:2770).

        ``dim=name`` is the reference layout: a new dim whose labels are
        the distinct tokens (sorted, '' dropped) with boolean presence
        values — distinct-tokens broadcast cross join + array_contains,
        no pivot.  ``dim=None`` keeps the legacy engine form (one
        indicator COLUMN per token, an XDataset)."""
        da = self.da
        split = F.split(self._c, "\\Q" + sep + "\\E")
        if dim is not None:
            toks = (da.df.select(F.explode(split).alias(dim))
                    .where(F.col(dim) != "").distinct())
            wide = da.df.select(*da.dims, split.alias("__sp"))
            out = wide.crossJoin(F.broadcast(toks)).select(
                *da.dims, dim,
                F.array_contains("__sp", F.col(dim)).alias(da.name))
            from xarray_spark.dataset import XDataArray
            return XDataArray(out, list(da.dims) + [dim], {},
                              [da.name], da.attrs)
        toks = F.explode(split).alias("__tok")
        long = da.df.select(*da.dims, toks)
        out = long.groupBy(*da.dims).pivot("__tok").agg(F.lit(1))
        out = out.na.fill(0)
        from xarray_spark.dataset import XDataset
        return XDataset(out, da.dims, {}, None, da.attrs)

    def extractall(self, pat: str, group_dim: str = "match",
                   match_dim: str | None = None,
                   case: bool | None = None, flags: int = 0,
                   group: int | None = None) -> "XDataArray":
        """All matches of all capture groups → two new dims (xarray
        core/accessor_str.py:2102).  MEASURED reference layout (the
        docstring there says otherwise): ``group_dim`` enumerates the
        MATCHES (size = max match count over the array, '' padded) and
        ``match_dim`` enumerates the capture GROUPS — dims are
        ``(*orig, group_dim, match_dim)``.  ``group=`` is the legacy
        non-reference extension: a flat (match_dim-only) explode of one
        group's matches.

        Plan shape: regexp_extract_all per group (map-only), a 1-row
        global-max aggregate broadcast back (the dense pad width), then
        two posexplodes — no driver action, no collect."""
        import re as _re
        da = self.da
        if group is not None:
            arr = F.regexp_extract_all(self._c, F.lit(pat), F.lit(group))
            df = da.df.select(
                *da.dims,
                F.posexplode_outer(arr).alias(match_dim or "match", da.name))
            return XDataArray(df, list(da.dims) + [match_dim or "match"],
                              {}, [da.name], da.attrs)
        if match_dim is None:
            raise TypeError("extractall() missing required argument: "
                            "'match_dim'")
        n = _re.compile(pat).groups
        if n == 0:
            raise ValueError("No capture groups found in pattern.")
        jpat = self._flagged(pat, case, flags)
        gcols = [F.regexp_extract_all(self._c, F.lit(jpat), F.lit(g))
                 .alias(f"__g{g}") for g in range(1, n + 1)]
        base = da.df.select(*da.dims, *gcols)
        mx = base.agg(F.max(F.size("__g1")).alias("__mx"))
        wide = base.crossJoin(F.broadcast(mx))
        midx = F.explode(
            F.when(F.col("__mx") > 0,
                   F.sequence(F.lit(0), F.col("__mx") - 1))
            .otherwise(F.array().cast("array<int>"))).alias("__mi")
        exploded = wide.select(*da.dims, *[f"__g{g}" for g in range(1, n + 1)],
                               midx)
        vals = F.array(*[
            F.when(F.col("__mi") < F.size(f"__g{g}"),
                   F.element_at(F.col(f"__g{g}"), F.col("__mi") + 1))
            .otherwise(F.lit("")) for g in range(1, n + 1)])
        df = exploded.select(
            *da.dims, F.col("__mi").alias(group_dim),
            F.posexplode(vals).alias(match_dim, da.name))
        return XDataArray(df, list(da.dims) + [group_dim, match_dim],
                          {}, [da.name], da.attrs)


class DatetimeAccessor(_Accessor):
    """~45 datetime fields/methods (xarray/core/accessor_dt.py)."""

    def _field(self, fn) -> XDataArray:
        return self._wrap(fn(self._c))

    @property
    def year(self): return self._field(F.year)
    @property
    def month(self): return self._field(F.month)
    @property
    def day(self): return self._field(F.dayofmonth)
    @property
    def hour(self): return self._field(F.hour)
    @property
    def minute(self): return self._field(F.minute)
    @property
    def second(self): return self._field(F.second)
    @property
    def dayofweek(self):
        # pandas: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        return self._wrap((F.dayofweek(self._c) + 5) % 7)
    weekday = dayofweek
    @property
    def dayofyear(self): return self._field(F.dayofyear)
    @property
    def quarter(self): return self._field(F.quarter)
    @property
    def weekofyear(self): return self._field(F.weekofyear)
    @property
    def days_in_month(self): return self._wrap(F.dayofmonth(F.last_day(self._c)))
    daysinmonth = days_in_month
    @property
    def date(self): return self._wrap(F.to_date(self._c))
    @property
    def time(self):
        """Wall-clock time as a string (Spark has no TIME type);
        str(datetime.time) form — fraction only when micros != 0,
        matching the reference's time objects rendered to str."""
        c = self._c
        has_us = F.date_format(c, "SSSSSS") != "000000"
        return self._wrap(
            F.when(has_us, F.date_format(c, "HH:mm:ss.SSSSSS"))
            .otherwise(F.date_format(c, "HH:mm:ss")))
    @property
    def season(self):
        m = F.month(self._c)
        return self._wrap(
            F.when(m.isin(12, 1, 2), "DJF").when(m.isin(3, 4, 5), "MAM")
            .when(m.isin(6, 7, 8), "JJA").otherwise("SON")
        )
    @property
    def is_month_start(self): return self._wrap(F.dayofmonth(self._c) == 1)
    @property
    def is_month_end(self): return self._wrap(F.to_date(self._c) == F.last_day(self._c))
    @property
    def is_quarter_start(self):
        return self._wrap((F.dayofmonth(self._c) == 1) & (F.month(self._c) % 3 == 1))
    @property
    def is_year_start(self): return self._wrap(F.dayofyear(self._c) == 1)
    @property
    def is_year_end(self):
        return self._wrap((F.month(self._c) == 12) & (F.dayofmonth(self._c) == 31))
    @property
    def is_leap_year(self):
        y = F.year(self._c)
        return self._wrap(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))
    @property
    def days_in_year(self):
        y = F.year(self._c)
        leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
        return self._wrap(F.when(leap, 366).otherwise(365))

    @property
    def is_quarter_end(self):
        return self._wrap(
            (F.to_date(self._c) == F.last_day(self._c)) & (F.month(self._c) % 3 == 0)
        )

    @property
    def microsecond(self):
        return self._wrap(
            (F.unix_micros(self._c.cast("timestamp")) % 1_000_000).cast("int")
        )

    @property
    def nanosecond(self):
        # nanos WITHIN the microsecond (pandas .dt.nanosecond): Spark
        # timestamps are microsecond-grain, so this is identically 0
        return self._wrap(F.lit(0).cast("int"))

    @property
    def weekday(self):
        return self.dayofweek

    def day_name(self):
        # Locale-independent: F.date_format(.., 'EEEE') renders in the JVM
        # default locale; pandas .dt.day_name() defaults to English.  Map
        # dayofweek (1=Sunday..7=Saturday) through a literal English array.
        names = F.array(*[F.lit(n) for n in (
            "Sunday", "Monday", "Tuesday", "Wednesday",
            "Thursday", "Friday", "Saturday")])
        return self._wrap(
            F.when(self._c.isNotNull(),
                   F.element_at(names, F.dayofweek(self._c))))

    def month_name(self):
        # Same locale-independence rationale as day_name.
        names = F.array(*[F.lit(n) for n in (
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November",
            "December")])
        return self._wrap(
            F.when(self._c.isNotNull(),
                   F.element_at(names, F.month(self._c))))

    @property
    def decimal_year(self):
        """Year + elapsed fraction (xarray/core/accessor_dt.py:594)."""
        y = F.year(self._c)
        start = F.make_date(y, F.lit(1), F.lit(1)).cast("timestamp")
        nxt = F.make_date(y + 1, F.lit(1), F.lit(1)).cast("timestamp")
        frac = (F.unix_timestamp(self._c.cast("timestamp")) - F.unix_timestamp(start)) / \
               (F.unix_timestamp(nxt) - F.unix_timestamp(start))
        return self._wrap(y.cast("double") + frac)

    def isocalendar(self):
        """(year, week, day) struct (xarray/core/accessor_dt.py:389).
        The ISO year is the year of the week's THURSDAY — it differs
        from the calendar year at boundaries (2024-12-30 is ISO
        2025-W01; wave-38 fix: F.year alone was wrong there)."""
        iso_day = ((F.dayofweek(self._c) + 5) % 7) + 1
        thursday = F.date_add(F.to_date(self._c),
                              (F.lit(4) - iso_day).cast("int"))
        return self._wrap(F.struct(
            F.year(thursday).alias("year"),
            F.weekofyear(self._c).alias("week"),
            # the reference names the ISO day-of-week field 'weekday'
            iso_day.alias("weekday"),
        ))

    _STRFTIME_MAP = {
        "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
        "%M": "mm", "%S": "ss", "%j": "DDD", "%f": "SSSSSS",
        "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
        "%p": "a", "%I": "hh", "%%": "%",
    }

    def strftime(self, fmt: str):
        """strftime (accessor_dt.py strftime): directives translated to
        the JVM DateTimeFormatter alphabet; an untranslatable %x raises
        instead of leaking raw letters into the pattern (wave-38 fix —
        SimpleDateFormat would silently reinterpret them)."""
        import re as _re
        out, i = [], 0
        while i < len(fmt):
            if fmt[i] == "%":
                d = fmt[i:i + 2]
                if d not in self._STRFTIME_MAP:
                    raise NotImplementedError(
                        f"strftime directive {d!r} has no JVM "
                        "DateTimeFormatter equivalent here")
                out.append(self._STRFTIME_MAP[d])
                i += 2
            else:
                # literal text is quoted so pattern letters stay inert
                j = i
                while j < len(fmt) and fmt[j] != "%":
                    j += 1
                lit = fmt[i:j]
                out.append("'" + lit.replace("'", "''") + "'"
                           if _re.search(r"[A-Za-z']", lit) else lit)
                i = j
        return self._wrap(F.date_format(self._c, "".join(out)))

    # pandas/xarray long-name aliases (accessor_dt.py:484-520)
    @property
    def day_of_week(self): return self.dayofweek
    @property
    def day_of_year(self): return self.dayofyear
    @property
    def week(self): return self.weekofyear

    @property
    def calendar(self) -> str:
        """Calendar name of the dim (accessor_dt.py:642) — metadata, not
        a column: real Spark timestamps are proleptic_gregorian; encoded
        cftime ordinals carry their calendar in attrs['calendar']."""
        return (self.da.attrs or {}).get("calendar", "proleptic_gregorian")

    # ---- timedelta fields (accessor_dt.py TimedeltaAccessor) ----------
    # Operate on DayTimeIntervalType columns (timestamp - timestamp) or
    # on plain numeric seconds; pandas remainder conventions.
    def _td_total_seconds(self):
        dtype = self.da.df.schema[self.da.name].dataType.simpleString()
        if dtype.startswith("interval"):
            # exact micros: shift the epoch by the interval and read it
            # back (cast-to-bigint truncates the fraction)
            micros = F.unix_micros(F.lit("1970-01-01").cast("timestamp") + self._c)
            return micros.cast("double") / 1_000_000
        return self._c.cast("double")

    @property
    def days(self):
        return self._wrap(F.floor(self._td_total_seconds() / 86400).cast("long"))

    @property
    def seconds(self):
        s = self._td_total_seconds()
        return self._wrap((s - F.floor(s / 86400) * 86400).cast("long"))

    @property
    def microseconds(self):
        s = self._td_total_seconds()
        frac = s - F.floor(s)
        return self._wrap(F.round(frac * 1_000_000).cast("long"))

    @property
    def nanoseconds(self):
        # micro-grain storage: nanos within the microsecond are 0
        return self._wrap(F.lit(0).cast("long"))

    def total_seconds(self):
        return self._wrap(self._td_total_seconds())

    def floor(self, freq: str):
        from xarray_spark.groupers import (TimeResampler, _parse_freq,
                                           _SUBSEC_US, _TRUNC)
        n, unit = _parse_freq(freq)
        if _freq_us(n, unit, _SUBSEC_US, _TRUNC) is None:
            # pandas: floor/ceil/round are Tick-only — 'W'/'MS'/...
            # raise (round-11 find: the engine silently floored to the
            # anchored week where pandas raises)
            raise ValueError(f"{freq!r} is a non-fixed frequency")
        return self._wrap(TimeResampler(freq).key_expr(self._c))

    def ceil(self, freq: str):
        from xarray_spark.groupers import (TimeResampler, _parse_freq,
                                           _SUBSEC_US, _TRUNC)
        floor = TimeResampler(freq).key_expr(self._c)
        n, unit = _parse_freq(freq)
        us_total = _freq_us(n, unit, _SUBSEC_US, _TRUNC)
        if us_total is None:
            raise NotImplementedError(f"ceil for {freq!r}")
        bump = F.when(self._c == floor, floor).otherwise(
            F.timestamp_micros(F.unix_micros(floor) + us_total)
        )
        return self._wrap(bump)

    def round(self, freq: str):
        from xarray_spark.groupers import (TimeResampler, _parse_freq,  # noqa: F401
                                           _SUBSEC_US, _TRUNC)
        n, unit = _parse_freq(freq)
        us_total = _freq_us(n, unit, _SUBSEC_US, _TRUNC)
        if us_total is None:
            raise NotImplementedError(f"round for {freq!r}")
        # exact MICROSECONDS, not unix_timestamp: the latter drops the
        # sub-second fraction BEFORE the rounding (round-9 fuzz find —
        # round('s') of 10.80 gave :10, and pre-1970 fractions
        # truncated the other way), and epoch micros stay exact in a
        # double below 2^53.  pandas dt.round is HALF-EVEN at the
        # midpoint (wave-38 diff find: 00:30 rounds to 00:00 for
        # freq='h', not 01:00) — bround on the bin quotient.
        e = F.unix_micros(self._c.cast("timestamp"))
        return self._wrap(F.timestamp_micros(
            (F.bround(e / F.lit(float(us_total))) * us_total)
            .cast("long")))
