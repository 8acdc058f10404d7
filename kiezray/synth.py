"""Deterministic generator for interleaved text+media document tables.

Produces the engine's native input shape (BASELINE.json.input_hint):
    (doc_id: string,
     spans: list<struct<kind:string, text:string, media_ref:string,
                        offset:int32>>)
plus gold tables (FIXTURES.md F4): gold_clusters (doc_id, entity_id) and
gold_links (source_id, target_id).

K latent entities are each expanded into 2..5 duplicate documents by
perturbing span text (token drop/swap, synonym substitution); media_ref
spans stay stable across duplicates. A hub knob replicates one entity's
surface form into many near-identical docs to create the skewed block the
pipeline must handle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "basalt",
    "cobalt", "dune", "ember", "fjord", "glade", "harbor", "isle",
    "jade", "krill", "lagoon", "mesa", "nectar", "onyx", "prairie",
    "quartz", "reef", "summit", "thicket", "umbra", "vale", "willow",
]

_SYNONYM = {
    "alpha": "alfa", "charlie": "charly", "echo": "eko", "golf": "golph",
    "india": "indya", "kilo": "kylo", "mike": "myke", "oscar": "oskar",
    "quebec": "kebec", "sierra": "siera", "uniform": "unif",
    "whiskey": "whisky", "yankee": "yanki", "amber": "ambre",
    "cobalt": "kobalt", "ember": "embur", "glade": "glayde",
    "isle": "aisle", "krill": "crill", "mesa": "maesa",
}


def _perturb(tokens: list[str], rng: np.random.RandomState) -> list[str]:
    out = []
    for t in tokens:
        r = rng.rand()
        if r < 0.06:
            continue  # drop
        if r < 0.18 and t in _SYNONYM:
            out.append(_SYNONYM[t])
            continue
        out.append(t)
    # adjacent swap
    if len(out) > 3 and rng.rand() < 0.3:
        i = rng.randint(0, len(out) - 1)
        out[i], out[i + 1] = out[i + 1], out[i]
    return out or tokens[:1]


def generate_docs(
    n_entities: int = 100,
    seed: int = 42,
    dup_range: tuple[int, int] = (2, 5),
    hub_entities: int = 1,
    hub_copies: int = 20,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Returns (docs, gold_clusters, gold_links)."""
    rng = np.random.RandomState(seed)
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    gold_doc: list[str] = []
    gold_ent: list[str] = []

    for e in range(n_entities):
        ent = f"ent{e:06d}"
        n_tok = rng.randint(24, 60)
        base = [ _VOCAB[i] for i in rng.randint(0, len(_VOCAB), n_tok) ]
        n_media = rng.randint(0, 3)
        media_refs = [f"media://{ent}/{j}" for j in range(n_media)]
        n_dups = (
            hub_copies
            if e < hub_entities
            else rng.randint(dup_range[0], dup_range[1] + 1)
        )
        for d in range(n_dups):
            toks = base if d == 0 else _perturb(base, rng)
            # split tokens into 2..4 text spans, interleave media spans
            n_text_spans = min(rng.randint(2, 5), max(1, len(toks) // 6))
            cut = sorted(
                rng.choice(
                    np.arange(1, len(toks)), size=n_text_spans - 1, replace=False
                ).tolist()
            ) if n_text_spans > 1 else []
            pieces = np.split(np.array(toks, dtype=object), cut)
            spans = []
            offset = 0
            for pi, piece in enumerate(pieces):
                text = " ".join(piece.tolist())
                spans.append(
                    {
                        "kind": "text",
                        "text": text,
                        "media_ref": "",
                        "offset": offset,
                    }
                )
                offset += len(text) + 1
                if pi < len(media_refs):
                    spans.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": media_refs[pi],
                            "offset": offset,
                        }
                    )
                    offset += 1
            doc_id = f"{ent}_d{d:03d}"
            doc_ids.append(doc_id)
            spans_col.append(spans)
            gold_doc.append(doc_id)
            gold_ent.append(ent)

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, span_type),
        }
    )
    gold_clusters = pa.table(
        {
            "doc_id": pa.array(gold_doc, pa.string()),
            "entity_id": pa.array(gold_ent, pa.string()),
        }
    )
    # labeled matching pairs: all intra-entity doc pairs
    src, tgt = [], []
    by_ent: dict[str, list[str]] = {}
    for d_id, ent in zip(gold_doc, gold_ent):
        by_ent.setdefault(ent, []).append(d_id)
    for members in by_ent.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                src.append(members[i])
                tgt.append(members[j])
    gold_links = pa.table(
        {
            "source_id": pa.array(src, pa.string()),
            "target_id": pa.array(tgt, pa.string()),
        }
    )
    return docs, gold_clusters, gold_links


def docs_from_plain_text(tbl: pa.Table, sentence_tokens: int = 12) -> pa.Table:
    """Adapt a plain (doc_id, text) table into the interleaved-span shape:
    text cut into fixed-size token spans with a deterministic media span
    between every other pair (exercises the same schema on driver data)."""
    ids = [str(x) for x in tbl["doc_id"].to_pylist()]
    texts = tbl["text"].to_pylist()
    spans_col = []
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        spans = []
        offset = 0
        for si in range(0, max(len(toks), 1), sentence_tokens):
            piece = " ".join(toks[si : si + sentence_tokens])
            spans.append(
                {"kind": "text", "text": piece, "media_ref": "", "offset": offset}
            )
            offset += len(piece) + 1
            if (si // sentence_tokens) % 2 == 1:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"media://doc{doc_id}/{si}",
                        "offset": offset,
                    }
                )
                offset += 1
        spans_col.append(spans)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "spans": pa.array(spans_col, span_type),
        }
    )
