"""Mention-span assembly + verb-head predicate extraction (turn-local).

BIO-collapsed span assembly (SURVEY.md §2 B-W4 semantics, executed
in-row): contiguous runs of tokens sharing a non-O NE label form one
mention; sentence segmentation at sentence-final PUNCT; for each VERB
head, the nearest mention before it is the subject and the nearest
mention after it (within the sentence) the object — the
"predicate extraction from POS/lemma patterns on verb heads" of the
north star. Canonicalization: a mention's ``lemma_norm`` is the
space-join of its tokens' lemmata ("canonicalization of surface forms to
lemmata").

These are pure functions over one turn's token list — unit-testable
without Spark — called from inside the fused Arrow stage so span
assembly costs ZERO shuffles (the relational window formulation of B-W4
exists as an oracle-checked query in ``__spark_entry__.py``; at 100 TB
the in-row form is strictly better: no explode, no exchange).
"""

from __future__ import annotations


def assemble_mentions_and_triples(tokens: list[dict], text: str):
    """tokens: [{token_id,start,len,form,lemma,upos,ne}, ...] in order.

    Returns (mentions, triples):
      mentions: [{mention_id, tok_start, tok_end, surface, lemma_norm, ne_type}]
      triples:  [{subj, pred, obj, subj_ne, obj_ne}] with subj/obj = lemma_norm
    """
    mentions: list[dict] = []
    cur_start = -1
    cur_ne = "O"

    def close(end_idx: int) -> None:
        if cur_ne != "O" and cur_start >= 0:
            first, last = tokens[cur_start], tokens[end_idx]
            surface = text[first["start"]: last["start"] + last["len"]]
            lemma_norm = " ".join(t["lemma"] for t in tokens[cur_start: end_idx + 1])
            mentions.append({
                "mention_id": len(mentions),
                "tok_start": cur_start, "tok_end": end_idx,
                "surface": surface, "lemma_norm": lemma_norm, "ne_type": cur_ne,
            })

    for i, t in enumerate(tokens):
        ne = t["ne"]
        if ne != cur_ne:  # label change closes any open span
            close(i - 1)
            cur_start, cur_ne = i, ne
    close(len(tokens) - 1)

    # sentence boundaries: sentence-final "." tokens
    sent_of = []
    s = 0
    for t in tokens:
        sent_of.append(s)
        if t["upos"] == "PUNCT" and t["form"] == ".":
            s += 1

    triples: list[dict] = []
    for i, t in enumerate(tokens):
        if t["upos"] != "VERB":
            continue
        sent = sent_of[i]
        subj = obj = None
        for m in mentions:  # nearest mention before the verb, same sentence
            if m["tok_end"] < i and sent_of[m["tok_end"]] == sent:
                if subj is None or m["tok_end"] > subj["tok_end"]:
                    subj = m
        for m in mentions:  # nearest mention after the verb, same sentence
            if m["tok_start"] > i and sent_of[m["tok_start"]] == sent:
                if obj is None or m["tok_start"] < obj["tok_start"]:
                    obj = m
        if subj is not None and obj is not None:
            triples.append({
                "subj": subj["lemma_norm"], "pred": t["lemma"],
                "obj": obj["lemma_norm"],
                "subj_ne": subj["ne_type"], "obj_ne": obj["ne_type"],
            })
    return mentions, triples
