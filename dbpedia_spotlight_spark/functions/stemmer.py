"""Stemming (SURVEY.md §2.2 T2).

Reference behavior: ``db/model/Stemmer.scala`` [U] wraps per-language
Snowball stemmers; tokens are stemmed before token-type lookup so that
inflected forms ("tables") match the lexicon entry ("table"). Round 1
shipped an identity-only seam; this module adds a full English Porter
stemmer (Porter, *An algorithm for suffix stripping*, Program 14(3),
1980 — the public algorithm Snowball's English stemmer descends from),
implemented from the published rule tables.

The stemmer is a *model* property (the reference attaches it to the
language's token store, not per request): ``compile_model(stemmer=...)``
stems the token-type vocabulary, the per-entity context histograms and
the FSA patterns at build time, and the request path stems query tokens
through ``SpotlightModel.stem`` before token-index lookup. Offsets are
untouched — stemming only changes the lookup key.
"""

from __future__ import annotations

from collections.abc import Callable

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m = number of VC sequences in w ([C](VC)^m[V])."""
    m = 0
    i, n = 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suffix: str, repl: str, min_m: int | None = None,
             cond: Callable[[str], bool] | None = None) -> tuple[str, bool]:
    """If w ends with suffix and the stem satisfies the condition, replace
    it. Returns (word, rule_fired) — Porter rules are first-match per
    step, so callers stop at the first fired suffix."""
    if not w.endswith(suffix):
        return w, False
    stem = w[: len(w) - len(suffix)]
    if min_m is not None and _measure(stem) <= min_m - 1:
        return w, True   # suffix matched; condition failed → step ends
    if cond is not None and not cond(stem):
        return w, True
    return stem + repl, True


def porter_stem(word: str) -> str:
    """Porter 1980, steps 1a–5b. Input is assumed lowercased (T5 runs
    before T2 in the tokenizer chain)."""
    w = word
    if len(w) <= 2:
        return w

    # --- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # --- step 1b
    fired_1b2 = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            fired_1b2 = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            fired_1b2 = True
    if fired_1b2:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # --- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # --- step 2 (m > 0), first-match
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        w, fired = _replace(w, suf, rep, min_m=1)
        if fired:
            break

    # --- step 3 (m > 0), first-match
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        w, fired = _replace(w, suf, rep, min_m=1)
        if fired:
            break

    # --- step 4 (m > 1), first-match; 'ion' needs stem ending s/t
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if suf == "ion":
            w, fired = _replace(
                w, suf, "",
                cond=lambda s: _measure(s) > 1 and s[-1:] in ("s", "t"))
        else:
            w, fired = _replace(w, suf, "", min_m=2)
        if fired:
            break

    # --- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # --- step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def identity_stem(word: str) -> str:
    return word


STEMMERS: dict[str, Callable[[str], str]] = {
    "identity": identity_stem,
    "porter": porter_stem,
}


def get_stemmer(name: str) -> Callable[[str], str]:
    try:
        return STEMMERS[name]
    except KeyError:
        raise ValueError(
            f"unknown stemmer: {name!r} (available: {sorted(STEMMERS)})"
        ) from None
