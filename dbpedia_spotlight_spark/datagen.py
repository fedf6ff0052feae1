"""Deterministic synthetic corpus + lexicon generator (FIXTURES.md).

north_rule forbids external data, so the Common-Crawl-style ``web_pages``
corpus (BASELINE.json input_hint schema) and the wikistats-style lexicon
tables are synthesized from a fixed seed. Design goals:

- the ``text`` column is computed with the *same* ``strip_html`` the
  pipeline uses → the byte-identical extraction gate is checkable;
- every planted mention has a known (url, begin, end, sf, uri) golden row;
- ambiguous surface forms are resolvable only via context tokens (so the
  generative disambiguator is genuinely exercised, not just priors);
- skew is planted on purpose: a mega-host owns ~20% of urls, and one
  stopword-like surface form sits below the spot gate (FIXTURES.md §1);
- a redirect chain (len 3) and a 2-cycle exercise the closure (K1).
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from dbpedia_spotlight_spark.functions.extraction import strip_html

DBPEDIA_PREFIX = "http://dbpedia.org/resource/"

_FILLER = (
    "the quick brown fox jumps over lazy dog while rain falls on green hills "
    "and people walk through busy streets reading news about science art music "
    "history travel food sports weather money work school family friends ideas "
    "light water stone paper glass metal wood cloth road bridge river mountain"
).split()

_STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "on", "for", "with"]

_TYPES = ["Person", "Place", "Organisation", "Work", "Species"]


@dataclass
class Lexicon:
    surface_forms: pd.DataFrame
    entities: pd.DataFrame
    pair_counts: pd.DataFrame
    token_counts: pd.DataFrame
    token_types: pd.DataFrame
    redirects: pd.DataFrame
    disambiguations: pd.DataFrame
    stopwords: pd.DataFrame
    # generator-internal truth used to plant resolvable mentions
    sf_candidates: dict[int, list[tuple[int, float]]]  # sf_id -> [(entity_id, prior)]
    ent_context: dict[int, list[str]]                  # entity_id -> context words
    sf_names: list[str]
    ent_uris: list[str]


def make_lexicon(seed: int = 42, n_entities: int = 60) -> Lexicon:
    rng = random.Random(seed)

    ent_uris = [f"{DBPEDIA_PREFIX}Thing_{i}" for i in range(n_entities)]
    ent_context: dict[int, list[str]] = {
        e: [f"ctx{e}w{j}" for j in range(8)] for e in range(n_entities)
    }
    supports = [rng.randint(5, 5000) for _ in range(n_entities)]
    types = [[rng.choice(_TYPES)] for _ in range(n_entities)]

    # Surface forms: unambiguous singles, multi-word, ambiguous (3-way),
    # plus one stopword-like sf below the spot gate.
    sf_rows = []
    sf_candidates: dict[int, list[tuple[int, float]]] = {}
    pair_rows = []
    sf_names: list[str] = []

    def add_sf(name: str, cand_entities: list[int], counts: list[int],
               annotated: int, total: int) -> int:
        sf_id = len(sf_names)
        sf_names.append(name)
        sf_rows.append((name, sf_id, annotated, total))
        tot = sum(counts)
        sf_candidates[sf_id] = [(e, c / tot) for e, c in zip(cand_entities, counts)]
        for e, c in zip(cand_entities, counts):
            pair_rows.append((sf_id, e, c))
        return sf_id

    eid = 0
    # 20 unambiguous single-word sfs
    for i in range(20):
        add_sf(f"alpha{i}", [eid], [rng.randint(50, 500)], 90, 100)
        eid += 1
    # 10 unambiguous multi-word sfs (2-3 tokens)
    for i in range(10):
        n_tok = 2 + (i % 2)
        name = " ".join(f"beta{i}t{j}" for j in range(n_tok))
        add_sf(name, [eid], [rng.randint(50, 500)], 85, 100)
        eid += 1
    # 10 ambiguous sfs, 3 candidates each, skewed priors (true ent varies)
    ambiguous_start = len(sf_names)
    for i in range(10):
        cands = [eid, eid + 1, eid + 2]
        add_sf(f"gamma{i}", cands, [70, 25, 5], 80, 100)
        eid += 3
    # stopword-like sf: huge total count, low annotated → below spot gate
    skew_sf = add_sf("zeta", [0], [10], 2, 1000)  # ann_prob = 0.002 < 0.05

    assert eid <= n_entities, "lexicon generator ran out of entities"

    # token counts: each entity's context words (high) + a few fillers (low)
    token_rows = []
    for e in range(n_entities):
        for w in ent_context[e]:
            token_rows.append((e, w, rng.randint(40, 80)))
        for w in rng.sample(_FILLER, 4):
            token_rows.append((e, w, rng.randint(1, 3)))

    # token_types: every word the generator can emit, with corpus counts
    vocab: dict[str, int] = {}
    def tok_count(w: str, c: int):
        vocab[w] = vocab.get(w, 0) + c
    for w in _FILLER:
        tok_count(w, 2000 + rng.randint(0, 500))
    for w in _STOPWORDS:
        tok_count(w, 20000)
    for e in range(n_entities):
        for w in ent_context[e]:
            tok_count(w, 50 + rng.randint(0, 20))
    for name in sf_names:
        for w in name.split():
            tok_count(w, 300)
    token_types = pd.DataFrame(
        [(w, i, c) for i, (w, c) in enumerate(sorted(vocab.items()))],
        columns=["token", "token_id", "corpus_count"],
    )
    tok_id = dict(zip(token_types["token"], token_types["token_id"]))
    token_counts = pd.DataFrame(
        [(e, tok_id[w], c) for (e, w, c) in token_rows],
        columns=["entity_id", "token_id", "count"],
    ).groupby(["entity_id", "token_id"], as_index=False)["count"].sum()

    # redirects: Alias_A → Alias_B → Thing_0 (chain len 2 hops); 2-cycle
    redirects = pd.DataFrame(
        [
            (f"{DBPEDIA_PREFIX}Alias_A", f"{DBPEDIA_PREFIX}Alias_B"),
            (f"{DBPEDIA_PREFIX}Alias_B", f"{DBPEDIA_PREFIX}Thing_0"),
            (f"{DBPEDIA_PREFIX}Cycle_X", f"{DBPEDIA_PREFIX}Cycle_Y"),
            (f"{DBPEDIA_PREFIX}Cycle_Y", f"{DBPEDIA_PREFIX}Cycle_X"),
        ],
        columns=["src_uri", "dst_uri"],
    )
    disambiguations = pd.DataFrame(
        [(f"{DBPEDIA_PREFIX}Thing_{n_entities - 1}",)], columns=["uri"]
    )

    return Lexicon(
        surface_forms=pd.DataFrame(
            sf_rows, columns=["sf", "sf_id", "annotated_count", "total_count"]
        ),
        entities=pd.DataFrame(
            {
                "uri": ent_uris,
                "entity_id": range(n_entities),
                "support": supports,
                "types": types,
            }
        ),
        pair_counts=pd.DataFrame(pair_rows, columns=["sf_id", "entity_id", "count"]),
        token_counts=token_counts,
        token_types=token_types,
        redirects=redirects,
        disambiguations=disambiguations,
        stopwords=pd.DataFrame({"token": _STOPWORDS}),
        sf_candidates=sf_candidates,
        ent_context=ent_context,
        sf_names=sf_names,
        ent_uris=ent_uris,
    )


def _wrap_html(rng: random.Random, title_words: list[str],
               paragraphs: list[list[str]], malformed: bool) -> str:
    """Build HTML whose strip_html() output is exactly
    '\\n'.join(' '.join(words))  for [title] + paragraphs.

    Inline tags wrap whole words; entities are escaped; script/style
    noise is injected between blocks (dropped by the stripper)."""
    def esc(w: str) -> str:
        return (w.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))

    def render_words(words: list[str]) -> str:
        out = []
        for w in words:
            e = esc(w)
            r = rng.random()
            if r < 0.08:
                e = f"<b>{e}</b>"
            elif r < 0.12:
                e = f"<i>{e}</i>"
            elif r < 0.14:
                # Deterministic cross-host target derived from the word
                # alone (no extra rng draw — fixture streams stay
                # byte-identical): the anchor-lexicon operators
                # (operators/anchors.py) see a consistent word→target
                # vote graph across the corpus.
                h = zlib.crc32(w.encode("utf-8"))
                e = (f'<a href="https://host{h % 51}.example/e/{w}">'
                     f"{e}</a>")
            out.append(e)
        return " ".join(out)

    body = []
    for words in paragraphs:
        if rng.random() < 0.2:
            body.append("<script>var x = 1 < 2; // noise</script>")
        if rng.random() < 0.1:
            body.append("<style>.c { color: red; }</style>")
        body.append(f"<p>{render_words(words)}</p>")
    html = (
        "<html><head>"
        f"<title>{render_words(title_words)}</title>"
        '<meta charset="utf-8"></head><body>'
        + "".join(body)
        + "</body></html>"
    )
    if malformed:
        html = html.replace("</body></html>", "<p>trailing junk")
    return html


def make_corpus(
    lex: Lexicon,
    n_docs: int = 200,
    seed: int = 7,
    mentions_per_doc: int = 4,
    para_words: int = 30,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Generate (web_pages, golden_annotations).

    web_pages: url, warc_ts, html(binary), text, lang  [input_hint schema]
    golden:    url, begin, end, surface_form, uri  (planted truth)
    """
    rng = random.Random(seed)
    base_ts = datetime(2024, 1, 1)
    pages = []
    golden = []

    spottable = [
        sf_id for sf_id, name in enumerate(lex.sf_names)
        if name != "zeta"
    ]
    ambiguous = [sf_id for sf_id in spottable if len(lex.sf_candidates[sf_id]) > 1]

    for i in range(n_docs):
        # mega-host skew: host0 owns ~20% of urls (FIXTURES.md §1)
        host = 0 if rng.random() < 0.2 else rng.randint(1, 50)
        url = f"https://host{host}.example/p/{i}"
        lang = "en" if rng.random() < 0.92 else rng.choice(["de", "fr"])
        malformed = rng.random() < 0.03

        n_paras = rng.randint(2, 4)
        paragraphs: list[list[str]] = []
        locked: list[set[int]] = []  # word indices already claimed per para
        planted: list[tuple[int, int, int, int]] = []  # (para, word_idx, sf_id, entity_id)

        for p in range(n_paras):
            words = [rng.choice(_FILLER) if rng.random() < 0.7 else rng.choice(_STOPWORDS)
                     for _ in range(para_words)]
            paragraphs.append(words)
            locked.append(set())

        def claim(p: int, idxs: list[int]) -> bool:
            if any(j in locked[p] for j in idxs):
                return False
            locked[p].update(idxs)
            return True

        if lang == "en":
            n_mentions = rng.randint(1, mentions_per_doc)
            for _ in range(n_mentions):
                # 40% ambiguous mention with planted context
                if ambiguous and rng.random() < 0.4:
                    sf_id = rng.choice(ambiguous)
                    cands = lex.sf_candidates[sf_id]
                    true_ent = rng.choice(cands)[0]
                else:
                    sf_id = rng.choice(spottable)
                    true_ent = lex.sf_candidates[sf_id][0][0]
                sf_tokens = lex.sf_names[sf_id].split()
                placed = False
                for _try in range(8):
                    p = rng.randrange(n_paras)
                    words = paragraphs[p]
                    pos = rng.randrange(3, len(words) - len(sf_tokens) - 3)
                    if claim(p, list(range(pos, pos + len(sf_tokens)))):
                        placed = True
                        break
                if not placed:
                    continue
                # plant (capitalize sometimes — tokenizer lowercases)
                for j, t in enumerate(sf_tokens):
                    words[pos + j] = t.capitalize() if rng.random() < 0.5 else t
                # plant context words for the true entity nearby
                ctx = lex.ent_context[true_ent]
                k = 0
                for _try in range(30):
                    if k >= 3:
                        break
                    cpos = rng.randrange(len(words))
                    if claim(p, [cpos]):
                        words[cpos] = ctx[k]
                        k += 1
                planted.append((p, pos, sf_id, true_ent))

        # also plant the below-gate stopword-like sf sometimes (must NOT spot)
        if rng.random() < 0.3:
            p = rng.randrange(n_paras)
            if claim(p, [0]):
                paragraphs[p][0] = "zeta"

        title = [rng.choice(_FILLER) for _ in range(4)]
        html = _wrap_html(rng, title, paragraphs, malformed)
        text = strip_html(html)

        # compute char offsets: text == '\n'.join(' '.join(w) for line in
        # [title]+paragraphs) — assert to keep the generator honest
        lines = [title] + paragraphs
        expect = "\n".join(" ".join(ws) for ws in lines)
        if malformed:
            expect += "\ntrailing junk"
        assert text == expect, f"generator/stripper divergence for {url}"

        line_start = [0]
        for ws in lines[:-1]:
            line_start.append(line_start[-1] + len(" ".join(ws)) + 1)

        for (p, pos, sf_id, true_ent) in planted:
            words = paragraphs[p]
            sf_tokens = lex.sf_names[sf_id].split()
            assert [w.lower() for w in words[pos:pos + len(sf_tokens)]] == sf_tokens
            start = line_start[p + 1] + sum(len(w) + 1 for w in words[:pos])
            end = start + len(" ".join(words[pos:pos + len(sf_tokens)]))
            golden.append((url, start, end, lex.sf_names[sf_id],
                           lex.ent_uris[true_ent]))

        pages.append((url, base_ts + timedelta(minutes=i),
                      html.encode("utf-8"), text, lang))

    web_pages = pd.DataFrame(
        pages, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    golden_df = pd.DataFrame(
        golden, columns=["url", "begin", "end", "surface_form", "uri"]
    ).drop_duplicates(subset=["url", "begin", "end"]).reset_index(drop=True)
    return web_pages, golden_df


def write_lexicon(spark, lex: Lexicon, out_dir: str) -> None:
    from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                                   StringType, StructField, StructType)
    schemas = {
        "surface_forms": None, "pair_counts": None, "token_counts": None,
        "token_types": None, "redirects": None, "disambiguations": None,
        "stopwords": None,
        "entities": StructType([
            StructField("uri", StringType()),
            StructField("entity_id", IntegerType()),
            StructField("support", LongType()),
            StructField("types", ArrayType(StringType())),
        ]),
    }
    for name, schema in schemas.items():
        pdf = getattr(lex, name)
        df = spark.createDataFrame(pdf, schema=schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def write_corpus(spark, web_pages: pd.DataFrame, out_dir: str,
                 partitions: int = 8) -> None:
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    spark.createDataFrame(web_pages, schema=schema) \
        .repartition(partitions) \
        .write.mode("overwrite").parquet(f"{out_dir}/web_pages.parquet")
