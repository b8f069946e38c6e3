"""Porter stemmer compiled to BOTH a Spark Column tree and a DuckDB SQL
scalar expression from ONE rule table.

The reference's fts filters run PostgreSQL ``to_tsvector('english', ...)``
(PostgREST ``fts(english)`` language tags select the stemming dictionary;
the engine previously documented "no stemming" as a deviation). This
module closes that gap Spark-first: the classic Porter algorithm (M.F.
Porter, "An algorithm for suffix stripping", Program 14(3) 1980 — public
knowledge) is expressed once as a tiny two-backend expression DSL, so

- :func:`porter_col` emits a pure Column tree (built-ins only — no UDF,
  no Python in the executor hot path; evaluated JVM-side per token), and
- :func:`porter_sql` emits the bit-identical plain-SQL scalar expression
  DuckDB runs (the offline oracle has no fts extension), and
- :func:`porter_py` is an independent pure-Python reference used for
  driver-side query-term stemming and as the test oracle for both.

All string logic is ASCII lower-case (the fts tokenizer lower-cases and
strips to [a-z0-9] first). Digits classify as consonants; tokens of
length <= 2 pass through unchanged (the standard reference-implementation
guard).

Implementation notes for the 100 TB read path: the whole stemmer is one
scalar expression over a token, mapped over the token array with
``transform`` — no shuffle, no UDF serialization, evaluated inline in the
scan stage. A corpus that filters by stemmed fts repeatedly should
materialize the stemmed-token array once at ingest (exactly what
``to_tsvector`` columns are for in PG); the expression here is that
ingest projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# --- two-backend expression DSL -------------------------------------------


class X:
    """An expression node: compiles to a Spark Column (``spark(env)``) or
    a DuckDB SQL string (``sql(env)``). ``env`` maps bound variable names
    to Columns / SQL identifiers."""

    def __init__(self, spark_fn, sql_fn):
        self._spark = spark_fn
        self._sql = sql_fn

    def spark(self, env) -> Column:
        return self._spark(env)

    def sql(self, env) -> str:
        return self._sql(env)

    # boolean algebra
    def __and__(self, o):
        return X(
            lambda e: self.spark(e) & o.spark(e),
            lambda e: f"({self.sql(e)} AND {o.sql(e)})",
        )

    def __or__(self, o):
        return X(
            lambda e: self.spark(e) | o.spark(e),
            lambda e: f"({self.sql(e)} OR {o.sql(e)})",
        )

    def __invert__(self):
        return X(
            lambda e: ~self.spark(e), lambda e: f"(NOT {self.sql(e)})"
        )

    # arithmetic / comparison (ints and strings)
    def __add__(self, o):
        return X(
            lambda e: self.spark(e) + o.spark(e),
            lambda e: f"({self.sql(e)} + {o.sql(e)})",
        )

    def __sub__(self, o):
        return X(
            lambda e: self.spark(e) - o.spark(e),
            lambda e: f"({self.sql(e)} - {o.sql(e)})",
        )

    def eq(self, o):
        return X(
            lambda e: self.spark(e) == o.spark(e),
            lambda e: f"({self.sql(e)} = {o.sql(e)})",
        )

    def ge(self, o):
        return X(
            lambda e: self.spark(e) >= o.spark(e),
            lambda e: f"({self.sql(e)} >= {o.sql(e)})",
        )

    def gt(self, o):
        return X(
            lambda e: self.spark(e) > o.spark(e),
            lambda e: f"({self.sql(e)} > {o.sql(e)})",
        )


def var(name: str) -> X:
    return X(lambda e: e[name], lambda e: e[name])


def lit(s: str) -> X:
    escaped = s.replace("'", "''")
    return X(lambda e: F.lit(s), lambda e: f"'{escaped}'")


def num(n: int) -> X:
    return X(lambda e: F.lit(n), lambda e: str(n))


def slen(x: X) -> X:
    return X(
        lambda e: F.length(x.spark(e)), lambda e: f"length({x.sql(e)})"
    )


def substr(x: X, pos: X, ln: X) -> X:
    """3-arg substring — identical 1-based semantics in Spark and DuckDB
    for pos >= 1 (callers guard pos >= 1 via length preconditions)."""
    return X(
        lambda e: F.substring(x.spark(e), pos.spark(e), ln.spark(e)),
        lambda e: f"substr({x.sql(e)}, {pos.sql(e)}, {ln.sql(e)})",
    )


def concat(*parts: X) -> X:
    return X(
        lambda e: F.concat(*[p.spark(e) for p in parts]),
        lambda e: "(" + " || ".join(p.sql(e) for p in parts) + ")",
    )


def replace(x: X, find: str, repl: str) -> X:
    """Literal replace-all, left-to-right non-overlapping in both engines."""
    return X(
        lambda e: F.replace(x.spark(e), F.lit(find), F.lit(repl)),
        lambda e: f"replace({x.sql(e)}, '{find}', '{repl}')",
    )


def re_replace(x: X, pat: str, repl: str) -> X:
    """Regex replace-all (DuckDB needs the explicit 'g' flag). Patterns
    here are plain character classes/anchors — identical in Java regex
    and RE2."""
    return X(
        lambda e: F.regexp_replace(x.spark(e), pat, repl),
        lambda e: f"regexp_replace({x.sql(e)}, '{pat}', '{repl}', 'g')",
    )


def instr(x: X, sub: str) -> X:
    return X(
        lambda e: F.instr(x.spark(e), sub),
        lambda e: f"instr({x.sql(e)}, '{sub}')",
    )


def in_chars(x: X, chars: str) -> X:
    opts = ", ".join(f"'{c}'" for c in chars)
    return X(
        lambda e: x.spark(e).isin(list(chars)),
        lambda e: f"({x.sql(e)} IN ({opts}))",
    )


def case(branches: list[tuple[X, X]], otherwise: X) -> X:
    def _spark(e):
        col = None
        for cond, val in branches:
            col = (
                F.when(cond.spark(e), val.spark(e))
                if col is None
                else col.when(cond.spark(e), val.spark(e))
            )
        return col.otherwise(otherwise.spark(e))

    def _sql(e):
        whens = " ".join(
            f"WHEN {c.sql(e)} THEN {v.sql(e)}" for c, v in branches
        )
        return f"(CASE {whens} ELSE {otherwise.sql(e)} END)"

    return X(_spark, _sql)


def bind(value: X, name: str, body: X) -> X:
    """let-binding via the single-element higher-order-function idiom:
    ``transform(array(v), name -> body)[first]`` — the only way to name an
    intermediate inside one scalar expression in both engines. Each mask
    is computed once per step instead of once per rule."""

    def _spark(e):
        arr = F.transform(
            F.array(value.spark(e)),
            lambda c: body.spark({**e, name: c}),
        )
        return F.element_at(arr, 1)

    def _sql(e):
        v = value.sql(e)
        b = body.sql({**e, name: name})
        return f"list_extract(list_transform([{v}], {name} -> {b}), 1)"

    return X(_spark, _sql)


# --- the Porter rule table -------------------------------------------------

# (suffix, replacement) — within a step only the LONGEST matching suffix is
# considered; if its m-condition fails, the word passes unchanged.
STEP2_RULES = sorted(
    [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ],
    key=lambda r: -len(r[0]),
)
STEP3_RULES = sorted(
    [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ],
    key=lambda r: -len(r[0]),
)
STEP4_SUFFIXES = sorted(
    [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ],
    key=lambda s: -len(s),
)


# --- pure-Python reference -------------------------------------------------


def _mask_py(w: str) -> str:
    """Consonant/vowel mask: a=vowel, b=consonant; y is a vowel iff the
    preceding letter classified as a consonant (word-initial y is a
    consonant)."""
    out: list[str] = []
    for i, ch in enumerate(w):
        if ch in "aeiou":
            out.append("a")
        elif ch == "y":
            out.append("a" if (i > 0 and out[i - 1] == "b") else "b")
        else:
            out.append("b")
    return "".join(out)


def _m_py(mask: str) -> int:
    """The measure m of [C](VC)^m[V] = count of vowel->consonant
    boundaries = non-overlapping 'ab' occurrences in the mask."""
    return (len(mask) - len(mask.replace("ab", ""))) // 2


def _o_py(w: str, k: str) -> bool:
    return len(w) >= 3 and k[-3:] == "bab" and w[-1] not in "wxy"


def _fix1b_py(w: str, k: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and k[-1] == "b"
        and w[-1] not in "lsz"
    ):
        return w[:-1]
    if _m_py(k) == 1 and _o_py(w, k):
        return w + "e"
    return w


def porter_py(word: str) -> str:
    """Pure-Python classic Porter stem (the test oracle for both compiled
    backends, and the driver-side query-term stemmer)."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    k = _mask_py(w)
    if w.endswith("eed"):
        if _m_py(k[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and "a" in k[:-2]:
        w = w[:-2]
        w = _fix1b_py(w, k[: len(w)])
    elif w.endswith("ing") and "a" in k[:-3]:
        w = w[:-3]
        w = _fix1b_py(w, k[: len(w)])
    # step 1c
    k = _mask_py(w)
    if w.endswith("y") and "a" in k[:-1]:
        w = w[:-1] + "i"
    # step 2
    k = _mask_py(w)
    for s, r in STEP2_RULES:
        if w.endswith(s):
            stem = w[: len(w) - len(s)]
            if _m_py(k[: len(stem)]) > 0:
                w = stem + r
            break
    # step 3
    k = _mask_py(w)
    for s, r in STEP3_RULES:
        if w.endswith(s):
            stem = w[: len(w) - len(s)]
            if _m_py(k[: len(stem)]) > 0:
                w = stem + r
            break
    # step 4
    k = _mask_py(w)
    for s in STEP4_SUFFIXES:
        if w.endswith(s):
            stem = w[: len(w) - len(s)]
            if _m_py(k[: len(stem)]) > 1 and (
                s != "ion" or (bool(stem) and stem[-1] in "st")
            ):
                w = stem
            break
    # step 5a
    k = _mask_py(w)
    if w.endswith("e"):
        stem, sk = w[:-1], k[:-1]
        mm = _m_py(sk)
        if mm > 1 or (mm == 1 and not _o_py(stem, sk)):
            w = stem
    # step 5b
    k = _mask_py(w)
    if _m_py(k) > 1 and len(w) >= 2 and w[-1] == "l" and w[-2] == "l":
        w = w[:-1]
    return w


# --- the compiled pipeline -------------------------------------------------


def _mask_x(w: X) -> X:
    """Compiled mask: vowels -> 'a', non-y consonants -> 'b', then resolve
    y runs by alternating passes ('by'->'ba': y after consonant is a
    vowel; 'ay'->'ab': y after vowel is a consonant). Four passes resolve
    runs up to length 8 — beyond any real token."""
    x = re_replace(w, "[aeiou]", "a")
    x = re_replace(x, "[^ay]", "b")
    x = re_replace(x, "^y", "b")
    for _ in range(4):
        x = replace(x, "by", "ba")
        x = replace(x, "ay", "ab")
    return x


def _ends(w: X, s: str) -> X:
    n = len(s)
    return slen(w).ge(num(n)) & substr(
        w, slen(w) - num(n - 1), num(n)
    ).eq(lit(s))


def _chop(w: X, n: int) -> X:
    return substr(w, num(1), slen(w) - num(n))


def _stem_mask(w: X, k: X, n: int) -> X:
    """Mask of the stem after removing an n-char suffix — a prefix slice
    of the word's mask (suffix letters never affect earlier positions)."""
    return substr(k, num(1), slen(w) - num(n))


def _m_gt0(sm: X) -> X:
    return instr(sm, "ab").gt(num(0))


def _m_count_ge(sm: X, c: int) -> X:
    # m >= c  <=>  len(mask) - len(replace(mask,'ab','')) >= 2c
    return (slen(sm) - slen(replace(sm, "ab", ""))).ge(num(2 * c))


def _m_eq1(sm: X) -> X:
    return (slen(sm) - slen(replace(sm, "ab", ""))).eq(num(2))


def _has_vowel(sm: X) -> X:
    return instr(sm, "a").gt(num(0))


def _last(w: X) -> X:
    return substr(w, slen(w), num(1))


def _ends_double_cons(w: X, k: X) -> X:
    return (
        slen(w).ge(num(2))
        & _last(w).eq(substr(w, slen(w) - num(1), num(1)))
        & _last(k).eq(lit("b"))
    )


def _o_x(w: X, k: X) -> X:
    return (
        slen(w).ge(num(3))
        & substr(k, slen(k) - num(2), num(3)).eq(lit("bab"))
        & ~in_chars(_last(w), "wxy")
    )


def _step1a(w: X) -> X:
    return case(
        [
            (_ends(w, "sses"), _chop(w, 2)),
            (_ends(w, "ies"), _chop(w, 2)),
            (_ends(w, "ss"), w),
            (_ends(w, "s"), _chop(w, 1)),
        ],
        w,
    )


def _step1b(w: X, k: X) -> X:
    # the post-removal fixups run on the stem w2 (a prefix of w), whose
    # mask is the matching prefix slice of k
    def fix(n_removed: int) -> X:
        w2 = _chop(w, n_removed)
        k2 = _stem_mask(w, k, n_removed)
        return bind(
            w2,
            "f",
            bind(
                k2,
                "g",
                case(
                    [
                        (
                            _ends(var("f"), "at")
                            | _ends(var("f"), "bl")
                            | _ends(var("f"), "iz"),
                            concat(var("f"), lit("e")),
                        ),
                        (
                            _ends_double_cons(var("f"), var("g"))
                            & ~in_chars(_last(var("f")), "lsz"),
                            _chop(var("f"), 1),
                        ),
                        (
                            _m_eq1(var("g")) & _o_x(var("f"), var("g")),
                            concat(var("f"), lit("e")),
                        ),
                    ],
                    var("f"),
                ),
            ),
        )

    return case(
        [
            (
                _ends(w, "eed"),
                case(
                    [(_m_gt0(_stem_mask(w, k, 3)), _chop(w, 1))], w
                ),
            ),
            (
                _ends(w, "ed") & _has_vowel(_stem_mask(w, k, 2)),
                fix(2),
            ),
            (
                _ends(w, "ing") & _has_vowel(_stem_mask(w, k, 3)),
                fix(3),
            ),
        ],
        w,
    )


def _step1c(w: X, k: X) -> X:
    return case(
        [
            (
                _ends(w, "y") & _has_vowel(_stem_mask(w, k, 1)),
                concat(_chop(w, 1), lit("i")),
            )
        ],
        w,
    )


def _rule_step(w: X, k: X, rules: list[tuple[str, str]]) -> X:
    """Steps 2 and 3: longest matching suffix wins; replacement applies
    only when m(stem) > 0."""
    branches = []
    for s, r in rules:
        repl = (
            concat(_chop(w, len(s)), lit(r)) if r else _chop(w, len(s))
        )
        branches.append(
            (
                _ends(w, s),
                case(
                    [(_m_gt0(_stem_mask(w, k, len(s))), repl)], w
                ),
            )
        )
    return case(branches, w)


def _step2(w: X, k: X) -> X:
    return _rule_step(w, k, STEP2_RULES)


def _step3(w: X, k: X) -> X:
    return _rule_step(w, k, STEP3_RULES)


def _step4(w: X, k: X) -> X:
    branches = []
    for s in STEP4_SUFFIXES:
        cond = _m_count_ge(_stem_mask(w, k, len(s)), 2)
        if s == "ion":
            cond = cond & in_chars(
                substr(w, slen(w) - num(3), num(1)), "st"
            )
        branches.append(
            (_ends(w, s), case([(cond, _chop(w, len(s)))], w))
        )
    return case(branches, w)


def _step5a(w: X, k: X) -> X:
    sm = _stem_mask(w, k, 1)
    stem = _chop(w, 1)
    drop = _m_count_ge(sm, 2) | (
        _m_eq1(sm) & ~_o_x(stem, sm)
    )
    return case([(_ends(w, "e"), case([(drop, stem)], w))], w)


def _step5b(w: X, k: X) -> X:
    return case(
        [
            (
                _m_count_ge(k, 2)
                & _ends(w, "ll"),
                _chop(w, 1),
            )
        ],
        w,
    )


def _with_mask(word: X, step, wname: str, kname: str) -> X:
    """Bind the step's input word and its (recomputed) mask once, then run
    the step's rule cascade against both."""
    return bind(
        word,
        wname,
        bind(
            _mask_x(var(wname)),
            kname,
            step(var(wname), var(kname)),
        ),
    )


def _pipeline(w: X) -> X:
    e = _step1a(w)
    e = _with_mask(e, _step1b, "w1", "k1")
    e = _with_mask(e, _step1c, "w2", "k2")
    e = _with_mask(e, _step2, "w3", "k3")
    e = _with_mask(e, _step3, "w4", "k4")
    e = _with_mask(e, _step4, "w5", "k5")
    e = _with_mask(e, _step5a, "w6", "k6")
    e = _with_mask(e, _step5b, "w7", "k7")
    return e


def _porter_x() -> X:
    w = var("w0")
    return case([(slen(w).ge(num(3)), _pipeline(w))], w)


_PORTER = _porter_x()


def porter_col(c: Column) -> Column:
    """Stem a (lower-case token) Column — pure built-in Column tree, no
    UDF. Usable inside higher-order lambdas (``F.transform`` over a token
    array)."""
    return _PORTER.spark({"w0": c})


def porter_sql(var_sql: str) -> str:
    """The identical stemmer as one DuckDB scalar SQL expression over
    ``var_sql`` (e.g. a lambda variable name inside list_transform)."""
    return _PORTER.sql({"w0": var_sql})
