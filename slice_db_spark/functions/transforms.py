"""Deterministic pseudonymization transforms — the engine's scalar-function
surface.

Semantics follow the reference's transform library (`slice_db/transform.py`,
`slice_db/transforms/*`): every transform is ``Optional[str] ->
Optional[str]``, deterministic given a ``pepper`` (reference contract,
README.md:116-118).  Determinism mechanism: a per-value RNG seeded from
``md5(normalized_value + pepper)`` (reference `slice_db/transforms/common.py:9-15`);
each *named* transform instance gets the run pepper with its own name
appended (`slice_db/transform.py:44`) so two columns bound to differently
named instances of the same class scrub independently.

This is a fresh implementation, not a port: wordlists are our own
(`..data.wordlists`), the FPE used by ``alphanumeric {unique: true}`` is an
in-house Feistel cycle-walker rather than pyffx, and golden tests pin *our*
outputs.  The JSON config shape is byte-compatible with the reference
(`slice_db/formats/transform.py:11-35`) so configs port verbatim.

Spark execution model: transforms run as Arrow-vectorized pandas UDFs
(`transform_dataframe``) over ``cast("string")`` values, cast back to the
column's original type — string-in/string-out exactly like the reference's
COPY-text pipeline, but batched through Arrow instead of line-at-a-time.
The one *stateful* transform (``incrementing_const``,
`slice_db/transforms/common.py:66-85`) is order-dependent and therefore not
a scalar UDF at all: the engine maps it to a distributed running count in an
explicit deterministic key order — per-bucket windows plus a driver-folded
cumulative bucket offset, never a single-partition global window (SURVEY §7
hard parts — documented divergence: the reference counts in traversal order,
we count in key order; both satisfy the determinism-given-pepper contract).
"""

from __future__ import annotations

import calendar
import datetime as _dt
import hashlib
import importlib
import json
import random
import re
from dataclasses import dataclass, field
from typing import Callable, Optional, Protocol

import pandas as pd

from ..data import wordlists


# --------------------------------------------------------------------------- core


def _seed_rng(text: str, pepper: str) -> random.Random:
    """Value-keyed RNG: same (value, pepper) → same stream (reference
    mechanism `slice_db/transforms/common.py:9-15`)."""
    digest = hashlib.md5((text + "\x00" + pepper).encode("utf-8")).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


class Transform(Protocol):
    """Plugin protocol (reference `slice_db/transform.py:12-17`): custom
    transforms implement ``__call__``; config binds them by
    ``{class, module, config}`` exactly like the reference registry."""

    def __call__(self, text: Optional[str]) -> Optional[str]: ...


@dataclass
class TransformContext:
    """Shared state handed to transform factories: the run pepper and the
    name→instance map for cross-referencing transforms (reference
    `slice_db/transform.py:24-32`, two-phase init for mutual reference)."""

    pepper: str
    named: dict[str, Transform] = field(default_factory=dict)
    #: wordlists the registry draws from — swap via build_registry's
    #: wordlist_dir for reference-golden compat (data/wordlists.py)
    lists: "wordlists.WordlistSet" = field(default_factory=lambda: wordlists.WordlistSet())
    #: reference-golden compat: route ``alphanumeric {unique: true}`` through
    #: the pyffx-compatible cipher instead of the in-house Feistel walker
    ffx_compat: bool = False

    def instance_pepper(self, name: str) -> str:
        # reference appends the transform *name* to the pepper per instance
        # (`slice_db/transform.py:44`)
        return self.pepper + name


# ----------------------------------------------------------------- case utils

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _case_pattern(word: str) -> str:
    if word.isupper() and len(word) > 1:
        return "upper"
    if word[:1].isupper():
        return "title"
    return "lower"


def _apply_case(word: str, pattern: str) -> str:
    if pattern == "upper":
        return word.upper()
    if pattern == "title":
        return word[:1].upper() + word[1:].lower()
    return word.lower()


def _pick_cased(rng: random.Random, choices: list[str], like: str) -> str:
    return _apply_case(rng.choice(choices), _case_pattern(like) if like else "title")


# ------------------------------------------------------------------ transforms

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
DIGITS = "0123456789"


def alphanumeric(pepper: str) -> Transform:
    """Per-character random replacement preserving case class, digit class,
    and every non-alphanumeric character; one RNG seeded from the whole
    value (reference `slice_db/transforms/text.py:17-43`)."""

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        rng = _seed_rng(text, pepper)
        out = []
        for ch in text:
            if ch.islower() and ch.isalpha():
                out.append(rng.choice(LOWER))
            elif ch.isupper() and ch.isalpha():
                out.append(rng.choice(UPPER))
            elif ch.isdigit():
                out.append(rng.choice(DIGITS))
            else:
                out.append(ch)
        return "".join(out)

    return f


def alphanumeric_ffx(pepper: str) -> Transform:
    """Reference-golden compat variant of `alphanumeric`
    (`slice_db/transforms/text.py:17-43` + `common.py:9-15`): RNG seeded
    from ``md5(upper(text) + pepper)[0:8]`` big-endian, characters replaced
    via ``randint`` over the class's ordinal range with *unicodedata*
    category classing — reproduces the reference's pinned golden
    (``"123 Main St $9.99"`` + pepper ``abc`` → ``"850 Xxqy Wh $0.97"``)."""
    import unicodedata as _ud

    _UP = {"Lu", "Lt", "Co", "Cs", "So"}
    _LO = {"Ll", "Lm", "Lo"}
    _NUM = {"Nd", "Nl", "No"}

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        digest = hashlib.md5(text.upper().encode("utf-8") + pepper.encode("utf-8")).digest()
        rng = random.Random(int.from_bytes(digest[:8], "big"))
        out = []
        for ch in text:
            cat = _ud.category(ch)
            if cat in _UP:
                out.append(chr(rng.randint(ord("A"), ord("Z"))))
            elif cat in _LO:
                out.append(chr(rng.randint(ord("a"), ord("z"))))
            elif cat in _NUM:
                out.append(chr(rng.randint(ord("0"), ord("9"))))
            else:
                out.append(ch)
        return "".join(out)

    return f


def _feistel_permute(n: int, size: int, key: bytes, rounds: int = 4) -> int:
    """Bijective map on [0, size) via a balanced Feistel network + cycle
    walking — public-domain FPE construction (NIST FFX family shape).
    Replaces the reference's pyffx dependency
    (`slice_db/transforms/text.py:45-61`) with an in-house primitive."""
    bits = max(2, (size - 1).bit_length())
    half = bits // 2
    mask = (1 << half) - 1
    x = n
    while True:
        left, right = x >> half, x & mask
        for r in range(rounds):
            h = hashlib.md5(key + bytes([r]) + right.to_bytes(8, "big")).digest()
            left, right = right, left ^ (int.from_bytes(h[:8], "big") & mask)
        x = (left << half) | right
        if x < size:
            return x
        # cycle-walk: re-encrypt until we land inside the domain


def alphanumeric_unique(pepper: str) -> Transform:
    """Format-preserving *bijection* over the value's inferred alphabet —
    distinct inputs map to distinct outputs of identical shape (the
    reference's ``{unique: true}`` mode, `slice_db/transforms/text.py:45-61`).
    Alphabet inference is per-value: lower/upper/digit classes present in
    the input define the symbol set, non-alphanumerics stay fixed."""

    key = hashlib.md5(pepper.encode("utf-8")).digest()

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        alphabet = ""
        if any(c.islower() and c.isalpha() for c in text):
            alphabet += LOWER
        if any(c.isupper() and c.isalpha() for c in text):
            alphabet += UPPER
        if any(c.isdigit() for c in text):
            alphabet += DIGITS
        if not alphabet:
            return text
        positions = [i for i, c in enumerate(text) if c in alphabet]
        if not positions:
            return text
        base = len(alphabet)
        idx = {c: i for i, c in enumerate(alphabet)}
        n = 0
        for i in positions:
            n = n * base + idx[text[i]]
        size = base ** len(positions)
        m = _feistel_permute(n, size, key)
        out = list(text)
        for i in reversed(positions):
            out[i] = alphabet[m % base]
            m //= base
        return "".join(out)

    return f


def _ffx_round(key: bytes, radix: int, i: int, s: int, v: list[int]) -> list[int]:
    """One FFX round function: s pseudorandom base-``radix`` digits from
    HMAC-SHA1(key, pack(round, *digits) || pack(counter)), expanded by
    incrementing the trailing counter and decomposing each digest as a
    big-endian integer into little-endian base-radix digits."""
    import hmac as _hmac
    import struct as _struct

    msg = _struct.pack("I%dI" % len(v), i, *v)
    digits: list[int] = []
    counter = 0
    while len(digits) < s:
        d = _hmac.new(key, msg + _struct.pack("I", counter), hashlib.sha1).digest()
        x = int.from_bytes(d, "big")
        while x and len(digits) < s:
            x, r = divmod(x, radix)
            digits.append(r)
        counter += 1
    return digits


def _ffx_encrypt(key: bytes, radix: int, v: list[int], rounds: int = 10) -> list[int]:
    """pyffx-compatible Feistel FPE over base-``radix`` digit vectors.

    Wire-compatible with the public ``pyffx`` package the reference uses for
    ``alphanumeric {unique: true}`` (`slice_db/transforms/text.py:45-61`):
    floor split, ten rounds of ``a, b = b, (a + F(i, b)) % radix``
    digit-wise, output ``a + b``.  The construction was pinned against the
    reference's own golden (`test/test_transform_field.py`:
    pepper ``abc`` + ``"abc"`` → ``"grk"``) and pyffx's published examples
    (``Integer(b"secret-key", 4)``: 1234 → 6103; ``String(b"secret-key",
    "abc", 6)``: ``"aaabbb"`` → ``"acbacc"``) — a unique solution over the
    design space, so reference transform-field goldens pass verbatim."""
    s = len(v) // 2
    a, b = list(v[:s]), list(v[s:])
    for i in range(rounds):
        f = _ffx_round(key, radix, i, len(a), b)
        c = [(x + y) % radix for x, y in zip(a, f)]
        a, b = b, c
    return a + b


def _ffx_decrypt(key: bytes, radix: int, v: list[int], rounds: int = 10) -> list[int]:
    """Inverse of `_ffx_encrypt` (used by tests to prove bijectivity)."""
    # the halves' lengths alternate once per round (only matters for odd |v|)
    la, lb = len(v) // 2, len(v) - len(v) // 2
    for _ in range(rounds):
        la, lb = lb, la
    a, b = list(v[:la]), list(v[la:])
    for i in range(rounds - 1, -1, -1):
        c = b
        b = a
        f = _ffx_round(key, radix, i, len(c), b)
        a = [(x - y) % radix for x, y in zip(c, f)]
    return a + b


def alphanumeric_unique_ffx(pepper: str) -> Transform:
    """Reference-golden compat mode for ``alphanumeric {unique: true}``:
    byte-identical to the reference's pyffx path
    (`slice_db/transforms/text.py:45-61`).  Differences from our default
    `alphanumeric_unique`: alphabet is built uppercase→lowercase→digits from
    *unicodedata* categories (Lu/Lt/Co/Cs/So upper, Ll/Lm/Lo lower,
    Nd/Nl/No number; empty → all three), non-alphabet characters are
    *substituted* by ``alphabet[ord(c) % len]`` rather than preserved, and
    the cipher is the pyffx FFX construction keyed on the raw pepper."""
    import unicodedata as _ud

    key = pepper.encode("utf-8")
    _UP = {"Lu", "Lt", "Co", "Cs", "So"}
    _LO = {"Ll", "Lm", "Lo"}
    _NUM = {"Nd", "Nl", "No"}

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        cats = {_ud.category(c) for c in text}
        alphabet = ""
        if cats & _UP:
            alphabet += UPPER
        if cats & _LO:
            alphabet += LOWER
        if cats & _NUM:
            alphabet += DIGITS
        if not alphabet:
            alphabet = UPPER + LOWER + DIGITS
        idx = {c: i for i, c in enumerate(alphabet)}
        digits = [
            idx[c] if c in idx else idx[alphabet[ord(c) % len(alphabet)]]
            for c in text
        ]
        out = _ffx_encrypt(key, len(alphabet), digits)
        return "".join(alphabet[i] for i in out)

    return f


def const(value: str) -> Transform:
    """Non-null → constant (reference `slice_db/transforms/common.py:34-47`)."""
    return lambda text: None if text is None else value


def null() -> Transform:
    """Always NULL (reference `slice_db/transforms/common.py:88-95`)."""
    return lambda text: None


def replace(old: str, new: str) -> Transform:
    """Case-insensitive literal find/replace (reference
    `slice_db/transforms/common.py:49-64`)."""
    pat = re.compile(re.escape(old), re.IGNORECASE)
    return lambda text: None if text is None else pat.sub(new, text)


def compose(parts: list[Transform]) -> Transform:
    """Function composition of named transforms, applied in config order
    (reference `slice_db/transforms/common.py:18-31`)."""

    def f(text: Optional[str]) -> Optional[str]:
        for p in parts:
            text = p(text)
        return text

    return f


def date_year(pepper: str) -> Transform:
    """Keep the year, pick a pepper-deterministic uniform day within it
    (leap-aware); ISO ``YYYY-MM-DD`` strings (reference
    `slice_db/transforms/date.py:9-28`)."""

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        d = _dt.date.fromisoformat(text.strip()[:10])
        rng = _seed_rng(text, pepper)
        day_of_year = rng.randrange(366 if calendar.isleap(d.year) else 365)
        return (_dt.date(d.year, 1, 1) + _dt.timedelta(days=day_of_year)).isoformat()

    return f


def _wordlist_transform(pepper: str, choices: list[str]) -> Transform:
    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        return _pick_cased(_seed_rng(text, pepper), choices, text)

    return f


def _lists(lists: "wordlists.WordlistSet | None") -> "wordlists.WordlistSet":
    return lists if lists is not None else wordlists.WordlistSet()


def given_name(pepper: str, lists=None) -> Transform:
    """Random given name, input case pattern preserved (reference
    `slice_db/transforms/person.py:9-14,25-37`)."""
    return _wordlist_transform(pepper, _lists(lists).given_names)


def surname(pepper: str, lists=None) -> Transform:
    """Reference `slice_db/transforms/person.py:17-22`."""
    return _wordlist_transform(pepper, _lists(lists).surnames)


def city(pepper: str, lists=None) -> Transform:
    """Reference `slice_db/transforms/address.py:56-78`."""
    return _wordlist_transform(pepper, _lists(lists).cities)


def address_line1(pepper: str, lists=None) -> Transform:
    """``"{1-9999} {street}"`` case-matched (reference
    `slice_db/transforms/address.py:10-35`)."""
    streets = _lists(lists).streets

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        rng = _seed_rng(text, pepper)
        num = rng.randint(1, 9999)
        street = _pick_cased(rng, streets, text)
        return f"{num} {street}"

    return f


def address_line2(pepper: str) -> Transform:
    """``"#{1-999}"`` (reference `slice_db/transforms/address.py:38-53`)."""

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        return f"#{_seed_rng(text, pepper).randint(1, 999)}"

    return f


def geozip(pepper: str, lists=None) -> Transform:
    """Random zip sharing the input's first-3-digit prefix, falling back to
    any zip; zero-padded to 5 (reference `slice_db/transforms/address.py:81-113`)."""
    ls = _lists(lists)
    by_prefix = ls.zips_by_prefix()

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        rng = _seed_rng(text, pepper)
        zs = by_prefix.get(text.strip()[:3], ls.zips)
        return rng.choice(zs).zfill(5)

    return f


def us_state(pepper: str, abbr: bool = False, lists=None) -> Transform:
    """Random US state name or abbreviation (reference
    `slice_db/transforms/address.py:116-146`)."""
    states = _lists(lists).states

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        ab, name = _seed_rng(text, pepper).choice(states)
        return ab if abbr else name

    return f


def word(pepper: str, lists=None) -> Transform:
    """Replace every letter-run with a dictionary word of the same length
    (longest available as fallback) preserving the word's case pattern;
    digits → random digits; everything else fixed; ONE RNG seeded from the
    full value (reference `slice_db/transforms/text.py:107-192`)."""
    by_len = _lists(lists).words_by_length()
    max_len = max(by_len)

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        rng = _seed_rng(text, pepper)

        def repl(m: re.Match) -> str:
            w = m.group(0)
            pool = by_len.get(len(w)) or by_len[max_len]
            return _apply_case(rng.choice(pool), _case_pattern(w))

        out = _WORD_RE.sub(repl, text)
        return "".join(rng.choice(DIGITS) if c.isdigit() else c for c in out)

    return f


# --- JSONPath ---------------------------------------------------------------

_JSONPATH_TOKEN = re.compile(r"\.([^.\[\]]+)|\[(\*|\d+)\]|\[(?:'([^']*)'|\"([^\"]*)\")\]")


def _jsonpath_steps(path: str) -> list[object]:
    """Parse a JSONPath subset: ``$.a.b[0].c[*]['k']``.  ``'*'`` matches
    every element/key at that step."""
    if not path.startswith("$"):
        raise ValueError(f"jsonpath must start with $: {path!r}")
    steps: list[object] = []
    pos = 1
    for m in _JSONPATH_TOKEN.finditer(path, 1):
        if m.start() != pos:
            raise ValueError(f"bad jsonpath {path!r} at {pos}")
        pos = m.end()
        if m.group(1) is not None:
            steps.append(m.group(1))
        elif m.group(2) is not None:
            steps.append("*" if m.group(2) == "*" else int(m.group(2)))
        else:
            steps.append(m.group(3) if m.group(3) is not None else m.group(4))
    if pos != len(path):
        raise ValueError(f"bad jsonpath {path!r} at {pos}")
    return steps


def json_path(paths: dict[str, Transform]) -> Transform:
    """Parse a JSON value and apply sub-transforms at each JSONPath match,
    re-serializing compactly.  Only string and null leaves are transformed;
    other types are left alone (reference `slice_db/transforms/json.py:11-47`).
    In-house matcher: dotted names, numeric indexes, ``[*]`` wildcards —
    jsonpath-ng is not required."""
    compiled = [(_jsonpath_steps(p), t) for p, t in paths.items()]

    def apply_at(node, steps, t: Transform):
        if not steps:
            return node  # replacement handled by the parent
        head, rest = steps[0], steps[1:]
        if isinstance(node, dict):
            keys = list(node) if head == "*" else [head] if head in node else []
            for k in keys:
                if rest:
                    node[k] = apply_at(node[k], rest, t)
                elif node[k] is None or isinstance(node[k], str):
                    node[k] = t(node[k])
        elif isinstance(node, list):
            if head == "*":
                idxs = range(len(node))
            elif isinstance(head, int) and -len(node) <= head < len(node):
                idxs = [head]
            else:
                idxs = []
            for i in idxs:
                if rest:
                    node[i] = apply_at(node[i], rest, t)
                elif node[i] is None or isinstance(node[i], str):
                    node[i] = t(node[i])
        return node

    def f(text: Optional[str]) -> Optional[str]:
        if text is None:
            return None
        doc = json.loads(text)
        for steps, t in compiled:
            doc = apply_at(doc, steps, t)
        return json.dumps(doc, separators=(",", ":"))

    return f


# ------------------------------------------------------------------- registry

#: class-name → factory(config, instance_pepper, ctx).  Matches the
#: reference's importlib registry surface (`slice_db/transform.py:35-45`):
#: config entries are ``{"class": name, "module": optional, "config": {...}}``
#: and unknown modules are imported, so user plugins load exactly the same way.
_BUILTIN: dict[str, Callable] = {
    "AlphanumericTransform": lambda cfg, pep, ctx: (
        (alphanumeric_unique_ffx(pep) if ctx.ffx_compat else alphanumeric_unique(pep))
        if cfg.get("unique")
        else (alphanumeric_ffx(pep) if ctx.ffx_compat else alphanumeric(pep))
    ),
    "ConstTransform": lambda cfg, pep, ctx: const(cfg["value"]),
    "NullTransform": lambda cfg, pep, ctx: null(),
    "ReplaceTransform": lambda cfg, pep, ctx: replace(cfg["old"], cfg["new"]),
    "ComposeTransform": lambda cfg, pep, ctx: compose(
        [ctx.named[name] for name in cfg["transforms"]]
    ),
    "DateYearTransform": lambda cfg, pep, ctx: date_year(pep),
    "GivenNameTransform": lambda cfg, pep, ctx: given_name(pep, lists=ctx.lists),
    "SurnameTransform": lambda cfg, pep, ctx: surname(pep, lists=ctx.lists),
    "AddressLine1Transform": lambda cfg, pep, ctx: address_line1(pep, lists=ctx.lists),
    "AddressLine2Transform": lambda cfg, pep, ctx: address_line2(pep),
    "CityTransform": lambda cfg, pep, ctx: city(pep, lists=ctx.lists),
    "GeozipTransform": lambda cfg, pep, ctx: geozip(pep, lists=ctx.lists),
    "UsStateTransform": lambda cfg, pep, ctx: us_state(
        pep, abbr=bool(cfg.get("abbr")), lists=ctx.lists
    ),
    "WordTransform": lambda cfg, pep, ctx: word(pep, lists=ctx.lists),
    "JsonPathTransform": lambda cfg, pep, ctx: json_path(
        {p: ctx.named[name] for p, name in cfg["paths"].items()}
    ),
}

#: marker for the stateful counter transform — handled at the DataFrame
#: level (bucketed running-count, see ``_global_running_count``), not as a
#: scalar function (see module doc).
STATEFUL_CLASSES = {"IncrementingConstTransform"}


def build_registry(
    transforms: dict[str, dict],
    pepper: str,
    wordlist_dir: str | None = None,
    ffx_compat: bool = False,
) -> tuple[dict[str, Transform], dict[str, dict]]:
    """Resolve named transform specs → callables.

    Returns ``(scalar, stateful)``: scalar transforms as functions, stateful
    specs (IncrementingConstTransform) passed through for the plan layer.
    Two-phase construction lets Compose/JsonPath reference other names in
    any declaration order (reference `slice_db/transform.py:52-77`); true
    self-reference cycles raise.

    ``wordlist_dir`` — reference-golden compat mode: load wordlists from a
    directory in the reference's data layout (``given-name.txt`` etc.)
    instead of the in-code lists; a user supplying the reference's own
    files reproduces its exact pseudonyms (`test/test_transform_field.py`).

    ``ffx_compat`` — same idea for ``alphanumeric {unique: true}``: use the
    pyffx-compatible cipher (`alphanumeric_unique_ffx`) so the reference's
    unique-alphanumeric goldens pass verbatim; default stays the in-house
    Feistel walker.
    """
    ctx = TransformContext(pepper=pepper, ffx_compat=ffx_compat)
    if wordlist_dir:
        ctx.lists = wordlists.WordlistSet.from_dir(wordlist_dir)
    stateful: dict[str, dict] = {}
    pending = {
        name: spec for name, spec in transforms.items() if spec.get("class") not in STATEFUL_CLASSES
    }
    stateful = {
        name: dict(spec, config=spec.get("config", {}))
        for name, spec in transforms.items()
        if spec.get("class") in STATEFUL_CLASSES
    }
    # fixed-point over declaration deps (Compose/JsonPath reference names)
    while pending:
        progressed = False
        for name in list(pending):
            spec = pending[name]
            cls = spec.get("class")
            cfg = spec.get("config", {}) or {}
            module = spec.get("module")
            try:
                if module:
                    mod = importlib.import_module(module)
                    factory = getattr(mod, cls)
                    inst = factory(cfg, ctx.instance_pepper(name), ctx)
                else:
                    inst = _BUILTIN[cls](cfg, ctx.instance_pepper(name), ctx)
            except KeyError as e:
                if cls in _BUILTIN or module:
                    continue  # dependency not built yet; retry next pass
                raise ValueError(f"unknown transform class {cls!r}") from e
            ctx.named[name] = inst
            del pending[name]
            progressed = True
        if not progressed:
            raise ValueError(f"unresolvable transform references: {sorted(pending)}")
    return ctx.named, stateful


# ------------------------------------------------------------ spark execution


def transform_dataframe(df, columns: dict[str, Transform], *, order_keys: list[str] | None = None,
                        stateful: dict[str, tuple[dict, list[str]]] | None = None):
    """Apply scalar transforms per column as Arrow-vectorized pandas UDFs,
    preserving each column's original Catalyst type (string round-trip, the
    reference's COPY-text model `slice_db/transform.py:96-125` — but batched).

    ``stateful`` maps column → (IncrementingConstTransform spec config,
    order keys): rendered as ``'<value> ' || <running count in key order>``
    skipping NULL/empty/excluded rows — the distributed reading of the
    reference's processing-order counter
    (`slice_db/transforms/common.py:66-85`), computed by
    :func:`_global_running_count` without any single-partition window.
    """
    from pyspark.sql import Window, functions as F
    from pyspark.sql.functions import pandas_udf

    out = df
    # one analysis pass: every transform preserves its column's Catalyst
    # type (scrub output is cast back to the original dtype), so the types
    # read off the INPUT frame stay valid for the whole chain — and
    # re-reading .dtypes per column would re-analyze a growing plan over
    # py4j each time
    dtypes = dict(df.dtypes)
    for col_name, t in columns.items():
        dtype = dtypes[col_name]

        def make(tf):
            @pandas_udf("string")
            def udf(s: pd.Series) -> pd.Series:
                return s.map(lambda v: tf(v) if v is not None else None)

            return udf

        scrubbed = make(t)(F.col(col_name).cast("string"))
        out = out.withColumn(col_name, scrubbed.cast(dtype))

    for col_name, (cfg, keys) in (stateful or {}).items():
        value = cfg.get("value", "")
        exclude = cfg.get("exclude")
        eligible = F.col(col_name).isNotNull() & (F.col(col_name).cast("string") != "")
        if exclude:
            eligible = eligible & ~F.col(col_name).cast("string").contains(exclude)
        key_names = keys or order_keys or [col_name]
        counter_df, counter_col = _global_running_count(out, key_names, eligible, dtypes)
        dtype = dtypes[col_name]
        out = counter_df.withColumn(
            col_name,
            F.when(
                eligible, F.concat(F.lit(value + " "), counter_col.cast("string")).cast(dtype)
            ).otherwise(F.col(col_name)),
        ).drop("_pid", "_local_cnt", "_off")
    return out


_NUMERIC_KEY_TYPES = ("tinyint", "smallint", "int", "bigint", "float", "double",
                      "date", "timestamp")

#: equal-depth key boundaries per (analyzed-plan semantic hash, key, buckets):
#: boundary stats are a pure function of the source data, so a steady-state
#: pipeline computes them once per dataset — the same memoization contract as
#: the traversal/LSH pair caches.  Bounded; evicts oldest insertion.
_BOUNDS_CACHE: dict[tuple, list[float]] = {}
_BOUNDS_CACHE_MAX = 64


def _key_as_double(first: str, ftype: str):
    """Order-preserving double view of a sort key.  DATE cannot cast to
    double directly (ANSI analysis error); route it through epoch days."""
    from pyspark.sql import functions as F

    if ftype == "date":
        return F.unix_date(F.col(first)).cast("double")
    return F.col(first).cast("double")


def _key_bounds(df, first: str, ftype: str, n_parts: int) -> list[float]:
    """Deduplicated equal-depth boundaries of ``df[first]`` (as double) from
    one `approxQuantile` pass over the pruned key column.  Boundaries only
    need to be *monotone* for the bucket decomposition to be exact, so the
    loose accuracy and the cache are both correctness-neutral."""
    from pyspark.sql import functions as F

    keyed = df.select(_key_as_double(first, ftype).alias("__k"))
    try:
        h = keyed._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        h = None
    ck = (h, first, n_parts)
    if h is not None and ck in _BOUNDS_CACHE:
        return _BOUNDS_CACHE[ck]
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = keyed.approxQuantile("__k", probs, 0.01)
    uniq = sorted({b for b in bounds if b == b})  # drop NaN, dedupe
    if h is not None:
        if len(_BOUNDS_CACHE) >= _BOUNDS_CACHE_MAX:
            _BOUNDS_CACHE.pop(next(iter(_BOUNDS_CACHE)))
        _BOUNDS_CACHE[ck] = uniq
    return uniq


def _global_running_count(df, key_names, eligible, dtypes=None):
    """Running count of eligible rows in global ``key_names`` order, computed
    WITHOUT a single-partition window: split the key space into range
    buckets, run the window per bucket, then add each bucket's broadcast
    cumulative eligible-count offset.  The counter value depends only on the
    global key order, so it is identical to ``sum(...) over (order by keys)``
    regardless of where the bucket boundaries fall — but every bucket sorts
    only its own slice.

    Fast path (numeric/temporal first key): the bucket is a PURE FUNCTION of
    the key value — equal-depth boundaries from one `approxQuantile` pass
    over the pruned key column.  That keeps the whole computation to a
    single full-data exchange: the window's hash shuffle on the bucket.  The
    alternative (`repartitionByRange` + `spark_partition_id`) costs three —
    the range sampling pass re-evaluates the upstream scrub UDFs over the
    entire input, the range exchange itself, and a second hash exchange for
    the window (the `_pid` grouping isn't recognized as satisfied by range
    partitioning) — which is what regressed `scrub_deterministic` in r4.

    Returns ``(df_with_helper_cols, counter_column)``; caller drops the
    ``_pid``/``_local_cnt`` helper columns.
    """
    import functools

    from pyspark.sql import Window, functions as F

    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    sort_cols = [F.col(k) for k in key_names]
    first = key_names[0]
    ftype = (dtypes or dict(df.dtypes)).get(first, "")
    if ftype in _NUMERIC_KEY_TYPES or ftype.startswith("decimal"):
        uniq = _key_bounds(df, first, ftype, n_parts)
        # NULL > b is NULL -> 0, so NULL keys land in bucket 0, matching
        # the window's ASC NULLS FIRST ordering
        key_d = _key_as_double(first, ftype)
        bucket = functools.reduce(
            lambda acc, b: acc + F.when(key_d > F.lit(b), 1).otherwise(0),
            uniq,
            F.lit(0),
        )
        base = df.withColumn("_pid", bucket)
    else:
        base = df.repartitionByRange(n_parts, *sort_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counted = base.withColumn(
        "_local_cnt", F.sum(F.when(eligible, 1).otherwise(0)).over(local_w)
    )
    # cumulative eligible-count offset per bucket: partial-aggregated
    # map-side in the fast path (the bucket is computable before any
    # shuffle), so only ~n_parts rows ever reach the driver.  The fold to
    # cumulative offsets happens HERE, not in a global window — a
    # broadcast-exchange subplan would run as its own job anyway, so the
    # collect costs the same job while eliminating the single-partition
    # WindowExec and the join from the plan entirely (the customer_abc
    # bucket-offset fold pattern).
    rows = (
        base.groupBy("_pid")
        .agg(F.sum(F.when(eligible, 1).otherwise(0)).alias("_n"))
        .collect()
    )
    acc = 0
    off: dict[int, int] = {}
    for r in sorted(rows, key=lambda r: r["_pid"]):
        off[r["_pid"]] = acc
        acc += int(r["_n"] or 0)
    if off:
        mapping = F.create_map(
            *[F.lit(x) for pid_off in off.items() for x in pid_off]
        )
        off_col = F.coalesce(mapping[F.col("_pid")], F.lit(0))
    else:  # empty input: no buckets, no offsets
        off_col = F.lit(0)
    joined = counted.withColumn("_off", off_col)
    return joined, F.col("_local_cnt") + F.col("_off")
