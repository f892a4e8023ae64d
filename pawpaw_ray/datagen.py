"""Deterministic synthetic transcript + alias-catalog generator.

Produces the input the engine is built over (the ``input_hint`` schema):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — multi-turn conversation transcripts whose text embeds
known SVO sentences, sentence-boundary distractors (the reference's golden
abbreviation cases), pronoun sentences for the cross-turn coreference window,
numbers, and occasional ASCII tables in tool turns.  Because generation is
rule-driven and seeded, golden outputs (expected triples per turn, pre- and
post-coreference) are known by construction.

Everything is a pure function of ``(seed, global_turn_index)``: the conv
layout is computed once (cheap), and each row's content derives from a
``random.Random`` seeded per turn.  Large scales are generated in parallel
with ``ray.data.range(n).map_batches(...)``; rows are written in a shuffled
order (affine permutation) so the engine must restore turn ordering.

No wall-clock anywhere: timestamps are a fixed epoch + deterministic offsets.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from bisect import bisect_right
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)

PREDICATES = ["founded", "acquired", "works at", "is located in", "met", "reported"]

# distractor sentences exercising the reference sentence-boundary rules
# (cases mirrored from /root/reference/tests/nlp/test_nlp.py:60-194)
DISTRACTORS = [
    "The king was John I.",
    "What day is it?",
    "Wait... how can that be?!?",
    "He lived a long life.",
    "100 years approximately.",
    "Hippocrates was born c. 460 bce.",
    "See pp. 431 in your history book for details.",
    "The plane landed 1.5 south of the airport; approximately 32.2540 N, 110.9742 W.",
    "https://github.com/rlayers/pawpaw is home to interesting software.",
    "Jane et. al. worked for Smith & Co. last year.",
    "Martin Luther King Jr.'s legacy endures.",
    "Dr. Francis hiked near Mt. Rainer.",
    "The U.S. Government decided against action.",
    "Avogadro's constant is 6.02214076x10^23 exactly.",
    "The invoice total was 1,234,567.89 dollars.",
    "There is no time to lose.",
]

FIRST_NAMES = [
    "Alice", "Bruno", "Carla", "Derek", "Elena", "Farid", "Grace", "Hugo",
    "Irene", "Jonas", "Katya", "Liam", "Mona", "Nils", "Oria", "Pablo",
    "Quinn", "Rosa", "Sven", "Tara",
]
LAST_NAMES = [
    "Almeida", "Brandt", "Costa", "Dietrich", "Evans", "Fontaine", "Garcia",
    "Hoffman", "Ito", "Jensen", "Klein", "Lindgren", "Moreau", "Novak",
    "Okafor", "Petrov", "Quist", "Rossi", "Schmidt", "Tanaka",
]
ORG_STEMS = [
    "Acme", "Borealis", "Cobalt", "Dynamo", "Everest", "Fathom", "Gridline",
    "Harbor", "Ironwood", "Juniper", "Keystone", "Lumen", "Meridian",
    "Northgate", "Obsidian", "Pinnacle", "Quanta", "Redwood", "Summit",
    "Tidewater",
]
ORG_SUFFIXES = [
    "Corporation", "Industries", "Labs", "Systems", "Holdings", "Group",
    "Partners", "Dynamics", "Logistics", "Analytics", "Networks", "Robotics",
    "Energy", "Capital", "Software", "Foundry",
]
CITY_VARIANTS = ["", " City", " Falls", " Heights", " Springs"]
CITY_STEMS = [
    "Ashford", "Brookhaven", "Cedarvale", "Dunmore", "Eastport", "Fairview",
    "Glenrock", "Hartwell", "Inverness", "Kingsford", "Lakewood", "Maplewood",
    "Northfield", "Oakridge", "Pinehurst", "Riverton", "Stonebridge",
    "Thornbury", "Westbrook", "Yellowpine",
]

TOOLS = ["search", "calc", "lookup", "summarize"]


@dataclass(frozen=True)
class Entity:
    entity_id: str
    entity_path: str  # "person" | "org.company" | "place.city"
    canonical: str
    aliases: tuple[str, ...]


def build_catalog(seed: int = SEED, n_person: int = 200, n_org: int = 200,
                  n_city: int = 100) -> list[Entity]:
    """~500-entity alias catalog; a handful of aliases are deliberately
    ambiguous (same surface form shared by two entities)."""
    rng = random.Random(seed * 7 + 1)
    ents: list[Entity] = []
    seen: set[str] = set()

    def uniq(name: str) -> bool:
        k = name.casefold()
        if k in seen:
            return False
        seen.add(k)
        return True

    k = 0
    while len(ents) < n_person:
        fn, ln = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
        canonical = f"{fn} {ln}"
        if not uniq(canonical):
            continue
        aliases = [canonical, f"{fn[0]}. {ln}"]
        if rng.random() < 0.3:
            aliases.append(fn)
        ents.append(Entity(f"ent-{k:05d}", "person", canonical, tuple(aliases)))
        k += 1
    while len(ents) < n_person + n_org:
        stem, suf = rng.choice(ORG_STEMS), rng.choice(ORG_SUFFIXES)
        canonical = f"{stem} {suf}"
        if not uniq(canonical):
            continue
        aliases = [canonical, f"{stem} {suf[:4]}.", stem.upper()]
        ents.append(Entity(f"ent-{k:05d}", "org.company", canonical, tuple(aliases)))
        k += 1
    while len(ents) < n_person + n_org + n_city:
        stem = rng.choice(CITY_STEMS)
        canonical = stem + rng.choice(CITY_VARIANTS)
        if not uniq(canonical):
            continue
        ents.append(Entity(f"ent-{k:05d}", "place.city", canonical, (canonical,)))
        k += 1
    return ents


def catalog_to_table(ents: list[Entity]) -> pa.Table:
    return pa.table({
        "entity_id": pa.array([e.entity_id for e in ents]),
        "entity_path": pa.array([e.entity_path for e in ents]),
        "canonical": pa.array([e.canonical for e in ents]),
        "aliases": pa.array([list(e.aliases) for e in ents], type=pa.list_(pa.string())),
    })


# ---------------------------------------------------------------------------
# conversation layout
# ---------------------------------------------------------------------------

def conv_layout(n_turns: int, seed: int = SEED, mega_frac: float = 0.2):
    """Deterministic conversation sizes: one mega-conversation holding
    ``mega_frac`` of all turns (the skew/salting fixture), the rest 4-40
    turns each.  Returns (conv_ids, cum_starts) where cum_starts[i] is the
    global index of conversation i's first turn."""
    rng = random.Random(seed * 13 + 2)
    sizes = [max(4, int(n_turns * mega_frac))] if n_turns >= 50 else []
    total = sum(sizes)
    while total < n_turns:
        s = min(rng.randint(4, 40), n_turns - total)
        sizes.append(s)
        total += s
    conv_ids = [f"conv-{i:06d}" for i in range(len(sizes))]
    cum = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=cum[1:])
    return conv_ids, cum


# ---------------------------------------------------------------------------
# per-turn text generation
# ---------------------------------------------------------------------------

def _svo_sentence(rng: random.Random, ents: list[Entity]) -> tuple[str, tuple[str, str, str, str, str]]:
    """Returns (sentence_text, (subj_alias, pred, obj_alias, subj_id, obj_id))."""
    subj = rng.choice(ents)
    obj = rng.choice(ents)
    pred = rng.choice(PREDICATES)
    s_alias = rng.choice(subj.aliases)
    o_alias = rng.choice(obj.aliases)
    return (f"{s_alias} {pred} {o_alias}.",
            (s_alias, pred, o_alias, subj.entity_id, obj.entity_id))


def _ascii_table(rng: random.Random) -> str:
    rows = [f"| item-{rng.randint(0, 99):02d} | {rng.randint(1, 999)} |"
            for _ in range(rng.randint(2, 4))]
    sep = "+----------+------+"
    return "\n".join([sep, "| name     | qty  |", sep, *rows, sep])


def gen_turn(seed: int, conv_i: int, turn_idx: int, n_in_conv: int,
             ents: list[Entity], want_golden: bool = False):
    """Pure function of (seed, conv index, turn index) → one row dict.

    When ``want_golden`` also returns the by-construction expected triples
    (subject surface may be a pronoun; ``subj_ref`` then names the person
    entity id the pronoun refers to — resolved from the same conversation's
    previous person subject)."""
    rng = random.Random(hash((seed, conv_i, turn_idx)) & 0xFFFFFFFF)
    role = ["user", "assistant"][turn_idx % 2]
    tool = ""
    if turn_idx % 5 == 4 and rng.random() < 0.6:
        role, tool = "tool", rng.choice(TOOLS)

    golden: list[tuple] = []
    paras: list[str] = []
    if role == "tool" and rng.random() < 0.5:
        paras.append(_ascii_table(rng))
    n_paras = rng.randint(1, 3)
    for _ in range(n_paras):
        sents: list[str] = []
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            if r < 0.45:
                txt, tr = _svo_sentence(rng, ents)
                sents.append(txt)
                golden.append(tr)
            elif r < 0.60:
                # pronoun subject; its referent is defined by the coref rule
                # (most recent preceding person-entity subject in the same
                # conversation within the window) — tests replay the
                # conversation in order to compute the expected resolution
                pred = rng.choice(PREDICATES)
                obj = rng.choice(ents)
                o_alias = rng.choice(obj.aliases)
                sents.append(f"He {pred} {o_alias}.")
                golden.append(("He", pred, o_alias, None, obj.entity_id))
            else:
                sents.append(rng.choice(DISTRACTORS))
        paras.append(" ".join(sents))
    text = "\n\n".join(paras)
    ts = EPOCH_US + conv_i * 86_400_000_000 + turn_idx * 7_000_000
    row = {
        "conv_id": f"conv-{conv_i:06d}",
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }
    if want_golden:
        row["golden"] = golden
    return row


# ---------------------------------------------------------------------------
# table generation (driver-side for small scales; Ray-parallel for bench)
# ---------------------------------------------------------------------------

_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table(
        {
            "conv_id": [r["conv_id"] for r in rows],
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": [r["role"] for r in rows],
            "text": [r["text"] for r in rows],
            "tool": [r["tool"] for r in rows],
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        },
        schema=_SCHEMA,
    )


def _perm(i: np.ndarray, n: int) -> np.ndarray:
    """Affine shuffled write order: row i carries global turn (i*P+17) % n."""
    P = 2_654_435_761  # Knuth multiplicative constant; coprime with any 2^k
    while np.gcd(P % n if n else 1, n) != 1:
        P += 2
    return ((i.astype(np.int64) * (P % n)) + 17 % n) % n


def generate_transcripts(
    n_turns: int,
    out_path: str,
    seed: int = SEED,
    shuffle: bool = True,
    use_ray: bool | None = None,
) -> str:
    """Write ``transcripts.parquet`` (+ ``alias_catalog.parquet`` +
    ``meta.json``) under ``out_path``.  Cached: if meta.json matches the
    requested (seed, n_turns) the existing data is reused."""
    os.makedirs(out_path, exist_ok=True)
    meta_p = os.path.join(out_path, "meta.json")
    want = {"seed": seed, "n_turns": n_turns, "version": 3}
    if os.path.exists(meta_p):
        try:
            if json.load(open(meta_p)) == want:
                return out_path
        except Exception:
            pass

    ents = build_catalog(seed)
    conv_ids, cum = conv_layout(n_turns, seed)
    pq.write_table(catalog_to_table(ents),
                   os.path.join(out_path, "alias_catalog.parquet"))

    if use_ray is None:
        use_ray = n_turns > 200_000

    def batch_rows(global_idx: np.ndarray) -> pa.Table:
        order = _perm(global_idx, n_turns) if shuffle else global_idx
        rows = []
        for g in order:
            ci = bisect_right(cum, g) - 1
            rows.append(gen_turn(seed, ci, int(g - cum[ci]), int(cum[ci + 1] - cum[ci]), ents))
        return _rows_to_table(rows)

    tx_path = os.path.join(out_path, "transcripts")
    if use_ray:
        import ray
        import ray.data as rd
        ents_ref = ray.put(ents)
        cum_ref = ray.put(cum)

        def gen_batch(b: pa.Table) -> pa.Table:
            import ray as _r
            e = _r.get(ents_ref)
            c = _r.get(cum_ref)
            idx = b["id"].to_numpy()
            order = _perm(idx, n_turns) if shuffle else idx
            rows = []
            for g in order:
                ci = bisect_right(c, g) - 1
                rows.append(gen_turn(seed, ci, int(g - c[ci]), int(c[ci + 1] - c[ci]), e))
            return _rows_to_table(rows)

        (rd.range(n_turns)
           .map_batches(gen_batch, batch_format="pyarrow", batch_size=16384)
           .write_parquet(tx_path))
    else:
        os.makedirs(tx_path, exist_ok=True)
        idx = np.arange(n_turns, dtype=np.int64)
        chunk = 50_000
        writer = None
        try:
            for off in range(0, n_turns, chunk):
                t = batch_rows(idx[off:off + chunk])
                if writer is None:
                    writer = pq.ParquetWriter(os.path.join(tx_path, "part-0.parquet"), t.schema)
                writer.write_table(t)
        finally:
            if writer is not None:
                writer.close()

    json.dump(want, open(meta_p, "w"))
    return out_path


def default_dir(n_turns: int, seed: int = SEED) -> str:
    tag = hashlib.sha1(f"{seed}:{n_turns}:v3".encode()).hexdigest()[:10]
    return f"/tmp/pawpaw_ray_data/tx_{n_turns}_{tag}"


def ensure_transcripts(n_turns: int, seed: int = SEED, use_ray: bool | None = None) -> str:
    """Generate-or-reuse the transcripts fixture; returns its directory."""
    return generate_transcripts(n_turns, default_dir(n_turns, seed), seed, use_ray=use_ray)
