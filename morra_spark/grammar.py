"""Deterministic generative grammar for synthetic transcripts.

Gold tokens/lemmas/POS/NE labels and gold triples are known *by
construction* (FIXTURES.md §3): each template instantiation records its
token annotations and its canonical ``(subj_lemma, verb_lemma, obj_lemma)``
triple at generation time, so the P/R ≥ 0.95 gate (BASELINE.json north
rule) needs zero manual annotation.

Capability parity notes (SURVEY.md §2 Part A): the closed lexical
inventories here play the role of morra's training corpus
([PK] corpuscula/corpus_dict.py::CorpusDict builds frequency dicts from a
gold corpus); the inflection→lemma variant maps mirror its
dictionary-lemmatization data; suffix rules (e.g. ``ies→y``) mirror its
suffix-transformation lemmatizer for OOV forms.

Pure Python + stdlib; used on the driver for fixture generation and
inside training (tiny data). Never on the executor hot path.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

# ---------------------------------------------------------------------------
# Lexical inventories (closed, deterministic)
# ---------------------------------------------------------------------------

_FIRST = [
    "Alice", "Boris", "Clara", "Dmitri", "Elena", "Felix", "Greta", "Hugo",
    "Irina", "Jonas", "Katya", "Leo", "Mara", "Nikolai", "Olga", "Pavel",
    "Quentin", "Rosa", "Stefan", "Tanya",
]
_LAST = [
    "Ivanov", "Smith", "Okafor", "Tanaka", "Muller", "Rossi", "Novak",
    "Haddad", "Larsen", "Petrov", "Kim", "Garcia",
]

_ORG_HEAD = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Cyberdyne",
    "Tyrell", "Aperture", "BlueSky", "Nimbus", "Vertex", "Quanta", "Helios",
    "Borealis", "Zephyr", "Calypso", "Drakkar", "Everest", "Fathom",
]
_ORG_SUFFIX = ["Corp", "Labs", "Systems", "Industries"]

_LOCATIONS = [
    "Moscow", "Berlin", "Tokyo", "Lagos", "Oslo", "Prague", "Lisbon",
    "Kyoto", "Denver", "Quito", "Tbilisi", "Vienna", "Zagreb", "Helsinki",
    "Porto", "Seoul", "Riga", "Turin", "Geneva", "Malmo", "Bergen",
    "Krakow", "Sofia", "Lima", "Osaka", "Basel", "Leipzig", "Graz",
    "Tallinn", "Vilnius",
]

_PRODUCT_HEAD = [
    "Widget", "Gadget", "Turbine", "Compiler", "Reactor", "Sensor",
    "Drone", "Router", "Synthesizer", "Telescope", "Gearbox", "Battery",
    "Antenna", "Console", "Scanner",
]
_PRODUCT_MODEL = ["X1", "Pro", "Mini", "Ultra", "Nano", "Max", "Prime", "Zero"]

# verb lemma -> surface inflections (first entry = the lemma's own finite
# form is NOT required to be in the list; all surfaces map back to lemma)
VERBS: dict[str, list[str]] = {
    "found": ["founded", "founds", "founding"],
    "acquire": ["acquired", "acquires", "acquiring"],
    "launch": ["launched", "launches", "launching"],
    "build": ["built", "builds", "building"],
    "ship": ["shipped", "ships", "shipping"],
    "design": ["designed", "designs"],
    "sell": ["sold", "sells", "selling"],
    "buy": ["bought", "buys", "buying"],
    "lead": ["led", "leads", "leading"],
    "join": ["joined", "joins"],
    "advise": ["advised", "advises", "advising"],
    "fund": ["funded", "funds", "funding"],
    "sue": ["sued", "sues", "suing"],
    "hire": ["hired", "hires", "hiring"],
    "fire": ["fired", "fires", "firing"],
    "merge": ["merged", "merges", "merging"],
    "audit": ["audited", "audits", "auditing"],
    "deploy": ["deployed", "deploys", "deploying"],
    "test": ["tested", "tests", "testing"],
    "patent": ["patented", "patents", "patenting"],
    "license": ["licensed", "licenses", "licensing"],
    "review": ["reviewed", "reviews", "reviewing"],
    "demo": ["demoed", "demos", "demoing"],
    "certify": ["certified", "certifies", "certifying"],
    "study": ["studied", "studies", "studying"],
}

# filler vocabulary for distractor clauses (common nouns etc.)
_FILLER_NOUNS = [
    "report", "meeting", "budget", "quarter", "roadmap", "deadline",
    "strategy", "market", "forecast", "contract", "invoice", "policy",
    "company", "berry", "city",
]
_FILLER_VERBS = {
    "discuss": ["discussed", "discusses"],
    "plan": ["planned", "plans"],
    "delay": ["delayed", "delays"],
    "approve": ["approved", "approves"],
}
_DETS = ["the", "a", "this", "that"]
_ADJS = ["new", "old", "quarterly", "final", "draft", "internal"]

STOPWORDS = {"the", "a", "an", "this", "that", "in", "at", "of", "and", "to"}


@dataclass
class Tok:
    """One gold token: surface form + annotations, offsets set at layout."""

    form: str
    lemma: str
    upos: str
    ne: str = "O"
    start: int = -1


@dataclass
class Sent:
    toks: list[Tok] = field(default_factory=list)
    # canonical (subj_lemma, pred_lemma, obj_lemma) triples, possibly empty
    triples: list[tuple[str, str, str]] = field(default_factory=list)


def _entity_variants(surface: str, rng: random.Random) -> list[str]:
    """1-3 inflected variants per canonical surface (possessive etc.)."""
    variants = [surface]
    if rng.random() < 0.6:
        variants.append(surface + "'s")
    return variants


class Lexicon:
    """Deterministic entity/verb inventories + lemma maps.

    ``canon`` maps every surface *token sequence* (tuple of token forms) to
    (canonical_lemma, ne_type). ``token_lemma`` maps individual token forms
    to their lemma (lowercased canonical piece) — this is the broadcast
    ``lex_dict`` analogue of morra's CorpusDict.
    """

    def __init__(self, seed: int = 42) -> None:
        rng = random.Random(seed)
        self.entities: dict[str, list[tuple[str, ...]]] = {}  # canon -> variant token-seqs
        self.entity_type: dict[str, str] = {}  # canon -> ne type

        persons = []
        for i in range(60):
            f = _FIRST[i % len(_FIRST)]
            l = _LAST[(i * 7 + i // len(_FIRST)) % len(_LAST)]
            persons.append(f"{f} {l}")
        orgs = []
        for i in range(40):
            h = _ORG_HEAD[i % len(_ORG_HEAD)]
            s = _ORG_SUFFIX[(i // len(_ORG_HEAD) + i) % len(_ORG_SUFFIX)]
            orgs.append(f"{h} {s}")
        locations = list(_LOCATIONS)
        products = []
        for i in range(30):
            h = _PRODUCT_HEAD[i % len(_PRODUCT_HEAD)]
            m = _PRODUCT_MODEL[(i // len(_PRODUCT_HEAD) + i) % len(_PRODUCT_MODEL)]
            products.append(f"{h} {m}")

        for names, ne in [
            (persons, "Person"),
            (orgs, "Org"),
            (locations, "Location"),
            (products, "Product"),
        ]:
            for surface in dict.fromkeys(names):  # dedupe, keep order
                canon = surface.lower()
                vs = []
                for v in _entity_variants(surface, rng):
                    vs.append(tuple(v.split(" ")))
                self.entities[canon] = vs
                self.entity_type[canon] = ne

        # token-level lemma map: entity tokens lemmatize to their lowered,
        # possessive-stripped form; verbs to their verb lemma; filler to self
        self.token_lemma: dict[str, tuple[str, str]] = {}  # form -> (lemma, upos)
        for canon, variants in self.entities.items():
            canon_toks = canon.split(" ")
            for var in variants:
                for i, tokform in enumerate(var):
                    base = canon_toks[min(i, len(canon_toks) - 1)]
                    self.token_lemma.setdefault(tokform, (base, "PROPN"))
        for lemma, surfaces in {**VERBS, **_FILLER_VERBS}.items():
            upos = "VERB" if lemma in VERBS else "VERB"
            for s in surfaces:
                self.token_lemma.setdefault(s, (lemma, upos))
        for n in _FILLER_NOUNS:
            self.token_lemma.setdefault(n, (n, "NOUN"))
            # plural variants exercise the suffix-rule lemmatizer
            if n.endswith("y"):
                self.token_lemma.setdefault(n[:-1] + "ies", (n, "NOUN"))
            else:
                self.token_lemma.setdefault(n + "s", (n, "NOUN"))
        for d in _DETS:
            self.token_lemma.setdefault(d, (d, "DET"))
        for a in _ADJS:
            self.token_lemma.setdefault(a, (a, "ADJ"))
        for p in ["in", "at", "of", "and", "to", "with"]:
            self.token_lemma.setdefault(p, (p, "ADP"))
        self.token_lemma["."] = (".", "PUNCT")

        self._canon_list = {
            ne: [c for c, t in self.entity_type.items() if t == ne]
            for ne in ("Person", "Org", "Location", "Product")
        }

    # -- suffix rules fixture (dictionary analogue for OOV lemmatization) --
    def suffix_rules(self) -> list[tuple[str, str, str, int]]:
        """(upos, suffix, replace, freq) rows, longest-match-wins."""
        return [
            ("NOUN", "ies", "y", 100),
            ("NOUN", "s", "", 50),
            ("VERB", "ing", "", 80),
            ("VERB", "ed", "", 80),
            ("VERB", "ies", "y", 70),
            ("VERB", "es", "e", 60),
            ("VERB", "s", "", 40),
            ("PROPN", "'s", "", 90),
        ]

    def pick_entity(self, ne: str, rng: random.Random) -> tuple[str, tuple[str, ...]]:
        canon = rng.choice(self._canon_list[ne])
        var = rng.choice(self.entities[canon])
        return canon, var


def _emit_entity(lex: Lexicon, canon: str, var: tuple[str, ...], ne: str) -> list[Tok]:
    canon_toks = canon.split(" ")
    out = []
    for i, f in enumerate(var):
        lemma = canon_toks[min(i, len(canon_toks) - 1)]
        out.append(Tok(f, lemma, "PROPN", ne))
    return out


def _emit_verb(rng: random.Random, table: dict[str, list[str]]) -> tuple[list[Tok], str]:
    lemma = rng.choice(sorted(table))
    surface = rng.choice(table[lemma])
    return [Tok(surface, lemma, "VERB")], lemma


def _distractor_clause(lex: Lexicon, rng: random.Random) -> list[Tok]:
    toks = [Tok(rng.choice(_DETS), "", "DET")]
    if rng.random() < 0.5:
        toks.append(Tok(rng.choice(_ADJS), "", "ADJ"))
    noun = rng.choice(_FILLER_NOUNS)
    form = noun
    if rng.random() < 0.3:  # pluralize → suffix-rule exercise
        form = noun[:-1] + "ies" if noun.endswith("y") else noun + "s"
    toks.append(Tok(form, noun, "NOUN"))
    for t in toks:
        if not t.lemma:
            t.lemma = t.form.lower()
    return toks


def gen_sentence(lex: Lexicon, rng: random.Random) -> Sent:
    """One grammar sentence; gold triples recorded by construction."""
    sent = Sent()
    r = rng.random()
    if r < 0.45:  # <Person> <verb> <Org>
        s_canon, s_var = lex.pick_entity("Person", rng)
        vtoks, vlemma = _emit_verb(rng, VERBS)
        o_canon, o_var = lex.pick_entity("Org", rng)
        sent.toks = (
            _emit_entity(lex, s_canon, s_var, "Person")
            + vtoks
            + _emit_entity(lex, o_canon, o_var, "Org")
        )
        sent.triples.append((s_canon, vlemma, o_canon))
    elif r < 0.75:  # <Org> <verb> <Product> in <Location>
        s_canon, s_var = lex.pick_entity("Org", rng)
        vtoks, vlemma = _emit_verb(rng, VERBS)
        o_canon, o_var = lex.pick_entity("Product", rng)
        l_canon, l_var = lex.pick_entity("Location", rng)
        sent.toks = (
            _emit_entity(lex, s_canon, s_var, "Org")
            + vtoks
            + _emit_entity(lex, o_canon, o_var, "Product")
            + [Tok("in", "in", "ADP")]
            + _emit_entity(lex, l_canon, l_var, "Location")
        )
        sent.triples.append((s_canon, vlemma, o_canon))
    elif r < 0.85:  # mention without verb pattern (no triple)
        ne = rng.choice(["Person", "Org", "Location", "Product"])
        canon, var = lex.pick_entity(ne, rng)
        sent.toks = (
            [Tok(rng.choice(_DETS), "", "DET")]
            + _distractor_clause(lex, rng)[1:]
            + [Tok("of", "of", "ADP")]
            + _emit_entity(lex, canon, var, ne)
        )
        for t in sent.toks:
            if not t.lemma:
                t.lemma = t.form.lower()
    else:  # pure distractor clause, no entities
        subj = _distractor_clause(lex, rng)
        vtoks, _ = _emit_verb(rng, _FILLER_VERBS)
        obj = _distractor_clause(lex, rng)
        sent.toks = subj + vtoks + obj
    sent.toks.append(Tok(".", ".", "PUNCT"))
    return sent


def gen_turn_text(lex: Lexicon, rng: random.Random) -> tuple[str, list[Tok], list[tuple[str, str, str]]]:
    """One turn = 1 sentence (95%) or 2 sentences (5%, multi-triple).

    Layout: tokens joined by single spaces EXCEPT sentence-final period,
    which attaches to the previous token (tests punctuation splitting).
    Returns (text, tokens-with-offsets, gold_triples).
    """
    sents = [gen_sentence(lex, rng)]
    if rng.random() < 0.05:
        sents.append(gen_sentence(lex, rng))

    toks: list[Tok] = []
    triples: list[tuple[str, str, str]] = []
    parts: list[str] = []
    pos = 0
    for sent in sents:
        for i, t in enumerate(sent.toks):
            attach = t.upos == "PUNCT" and parts  # period glued to prev token
            if parts and not attach:
                pos += 1  # the joining space
                parts.append(" ")
            t.start = pos
            parts.append(t.form)
            pos += len(t.form)
            toks.append(t)
        triples.extend(sent.triples)
    return "".join(parts), toks, triples


def tool_turn_text(rng: random.Random) -> str:
    """JSON-ish tool output: zero gold triples (negative example)."""
    status = rng.choice(["ok", "error", "partial"])
    n = rng.randint(0, 99)
    return f'{{"status": "{status}", "results": {n}, "latency_ms": {rng.randint(1, 2000)}}}'
