"""Corpus analytics over extracted spans — the reference's Analyzer
(`/root/reference/src/parser/analyzer/Analyzer.php:348-590`)
re-expressed as genuinely relational Ray Data operations: the per-doc
scene/dialog graph walk happens inside ``map_batches`` (sequential per
document, as in the reference), and the cross-corpus rollups become
``groupby`` aggregations.

Character-name normalization ports the reference's semantics:
uppercase + trim + NBSP trim (`Analyzer.php:389-397`), trailing
``(MOD)``/``[MOD]`` modifiers split off repeatedly (`:302-319`), and
multi-speaker headings split on ``&`` / `` AND `` / commas
(`:399-443`).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import pyarrow as pa

import ray
import ray.data

from .joins import sorted_small
from ray.data.aggregate import Count, Sum

_AND_SPLIT = re.compile(r"(&| AND )", re.IGNORECASE)


def split_character_modifier(name: str) -> Tuple[str, str]:
    """Pull trailing (MOD)/[MOD] off a character name, repeating."""
    modifier = ""
    while name[-1:] in (")", "]"):
        paren_begins = name.rfind("(")
        if paren_begins == -1:
            paren_begins = name.rfind("[")
        if paren_begins != -1:
            trimmed = name[:paren_begins].strip()
            if trimmed != "":
                modifier = name[paren_begins + 1:len(name) - 1].strip()
                name = trimmed
            else:
                break
        else:
            break
    return name, modifier


def strip_parens(name: str) -> str:
    return split_character_modifier(name)[0]


def normalize_character(name: str) -> str:
    return name.upper().strip().strip(" ")


def split_speakers(heading: str) -> List[str]:
    """Split "X & Y", "X AND Y", "X, Y AND Z" into speaker names,
    keeping parenthetical chunks intact (Analyzer.php:404-443)."""
    pieces_temp = _AND_SPLIT.split(heading)
    pieces: List[str] = []
    num = 0
    while num < len(pieces_temp):
        name = pieces_temp[num]
        paren_begins = name.rfind("(")
        close = ")"
        if paren_begins == -1:
            paren_begins = name.rfind("[")
            close = "]"
        if paren_begins != -1:
            if name.find(close, paren_begins) == -1 and num + 2 < len(pieces_temp):
                pieces_temp[num] = (pieces_temp[num] + pieces_temp[num + 1]
                                    + pieces_temp[num + 2])
                del pieces_temp[num + 1:num + 3]
                continue
        pieces.append(name)
        num += 2
    if len(pieces) > 1:
        expanded: List[str] = []
        for p in pieces:
            expanded.extend(p.split(","))
        pieces = expanded
    out: List[str] = []
    for p in pieces:
        p = p.strip()
        if p == "":
            continue
        p, _mod = split_character_modifier(p)
        if p != "":
            out.append(normalize_character(p))
    return out


def _doc_dialog_counts(spans: List[Dict]) -> Dict[str, Tuple[int, int]]:
    """Per-doc Analyzer walk (Analyzer.php:465-561 semantics):

    * a Character heading OPENS a speech for each listed speaker
      (split on &/AND/commas); a repeat of the same stripped name
      while a speech is open (NICK … NICK (CONT'D)) does NOT open a
      new speech — the CONT'D merge;
    * Dialogue/Parens attach to the open speech; Dialogue with no
      speech open opens one for the last speaker (*UNNAMED* if none);
    * every other kind terminates the open speech.

    Returns name -> (n_speeches, n_dialog_words)."""
    counts: Dict[str, List[int]] = {}

    def open_speech(names: List[str]) -> List[str]:
        for n in names:
            counts.setdefault(n, [0, 0])[0] += 1
        return names

    current: List[str] = []          # speakers of the open speech
    dialog_open = False
    last_characters: object = ""     # stripped heading of open speech
    last_character_name = "*UNNAMED*"
    for span in spans:
        kind = span["kind"]
        if kind == "Character":
            stripped = strip_parens(span["text"])
            dual = False  # dual flags live on objects, not spans
            if stripped != "" and (not dialog_open
                                   or last_characters != stripped or dual):
                last_characters = stripped
                last_character_name = span["text"]
                names = split_speakers(stripped)
                current = open_speech(names) if names else current
                dialog_open = bool(names)
        elif kind in ("Dialogue", "Parens"):
            if not dialog_open:
                names = split_speakers(strip_parens(last_character_name)) \
                    or ["*UNNAMED*"]
                current = open_speech(names)
                dialog_open = True
            if kind == "Dialogue":
                words = len(span["text"].split())
                for n in current:
                    counts.setdefault(n, [0, 0])[1] += words
        else:
            # everything else (Text/Scene/Action/Transition/New Act/
            # Shot/Title/…) terminates the open speech
            dialog_open = False
            last_characters = ""
    return {k: (v[0], v[1]) for k, v in counts.items()}


def character_dialog_counts(sf_dir: str, top_k: int = 25, spans=None):
    """Corpus-wide top speakers: per-doc graph walk inside map_batches,
    then a small groupby(character) rollup + sort/limit.  ``spans``
    (dataset or parquet path) or a session-shared extraction skips the
    per-query corpus re-extraction (see flagship.get_flagship_spans)."""
    from .flagship import get_flagship_spans

    ds = get_flagship_spans(sf_dir, spans)

    def per_doc(batch: pa.Table) -> pa.Table:
        names: List[str] = []
        speeches: List[int] = []
        words: List[int] = []
        for spans in batch.column("spans").to_pylist():
            for name, (n_sp, n_w) in _doc_dialog_counts(spans or []).items():
                names.append(name)
                speeches.append(n_sp)
                words.append(n_w)
        return pa.table({
            "character": pa.array(names, pa.string()),
            "n_speeches": pa.array(speeches, pa.int64()),
            "n_words": pa.array(words, pa.int64()),
        })

    return (sorted_small(ds.map_batches(per_doc, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("character")
              .aggregate(Sum("n_speeches", alias_name="n_speeches"),
                         Sum("n_words", alias_name="n_words")), ["n_speeches", "character"], descending=[True, False])
              .limit(top_k))


def scene_stats(sf_dir: str, spans=None):
    """Scene segmentation stats per document: scenes begin at Scene
    spans (Analyzer.php:528-543); rollup = corpus totals.

    Kind counting is pure Arrow: ``list_flatten`` + ``struct_field``
    + ``list_parent_indices`` feed one ``np.bincount`` per kind — no
    per-span Python walk (unlike the dialog graph, nothing here is
    sequential).  ``spans`` / the session share skips re-extraction."""
    import numpy as np
    import pyarrow.compute as pc

    from .flagship import get_flagship_spans

    ds = get_flagship_spans(sf_dir, spans)

    def per_doc(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        n = len(batch)
        kinds = pc.struct_field(pc.list_flatten(spans_col), "kind")
        parents = pc.list_parent_indices(spans_col) \
            .to_numpy(zero_copy_only=False)

        def count(kind: str) -> pa.Array:
            mask = pc.equal(kinds, kind).to_numpy(zero_copy_only=False)
            return pa.array(np.bincount(parents[mask], minlength=n)
                            .astype(np.int64), pa.int64())

        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_scenes": count("Scene"),
            "n_dialogue": count("Dialogue"),
            "n_action": count("Action"),
        })

    return sorted_small(ds.map_batches(per_doc, batch_format="pyarrow",
                          zero_copy_batch=True), "doc_id")


# ---------------------------------------------------------------------------
# Scene-analyzer plugin protocol (Analyzer.php:567-582)
# ---------------------------------------------------------------------------
#
# The reference's `Analyzer::analyze_scenes` iterates registered
# analyzer OBJECTS, calling `analyze(scene)` per scene and
# `display_analysis()` at the end; its test harness registers
# `DialogAverages` / `ActionVersusDialog` / `StructurePrinter` —
# classes that are never defined anywhere (TestParser.php:82-96, dead
# code).  Here the protocol is real: a registry of analyzer classes,
# the per-doc scene walk (scenes begin at Scene spans,
# Analyzer.php:528-543) feeding each plugin, and a corpus pipeline
# that runs the walk inside map_batches and rolls the per-doc results
# up relationally.

ANALYZER_REGISTRY: Dict[str, type] = {}


def register_analyzer(name: str):
    """Class decorator: register a scene analyzer under ``name``.
    An analyzer needs ``analyze(scene: List[Dict])`` (called once per
    scene, spans of that scene) and ``display_analysis() -> Dict``
    (flat numeric result)."""
    def deco(cls):
        ANALYZER_REGISTRY[name] = cls
        return cls
    return deco


@register_analyzer("DialogAverages")
class DialogAverages:
    """Average dialogue words per speech per scene — the reference
    registers this name but never ships the class."""

    def __init__(self) -> None:
        self.n_speeches = 0
        self.n_words = 0

    def analyze(self, scene: List[Dict]) -> None:
        for span in scene:
            if span["kind"] == "Character":
                self.n_speeches += 1
            elif span["kind"] == "Dialogue":
                self.n_words += len(span["text"].split())

    def display_analysis(self) -> Dict:
        return {"n_speeches": self.n_speeches, "n_dialog_words": self.n_words}


@register_analyzer("ActionVersusDialog")
class ActionVersusDialog:
    def __init__(self) -> None:
        self.action = 0
        self.dialog = 0

    def analyze(self, scene: List[Dict]) -> None:
        for span in scene:
            if span["kind"] == "Action":
                self.action += 1
            elif span["kind"] == "Dialogue":
                self.dialog += 1

    def display_analysis(self) -> Dict:
        return {"n_action": self.action, "n_dialogue": self.dialog}


def split_scenes(spans: List[Dict]) -> List[List[Dict]]:
    """Scene segmentation: a scene starts at each Scene span; leading
    non-scene spans form scene 0 (Analyzer.php:528-543)."""
    scenes: List[List[Dict]] = [[]]
    for span in spans:
        if span["kind"] == "Scene" and scenes[-1]:
            scenes.append([])
        scenes[-1].append(span)
    return [s for s in scenes if s]


def analyze_scenes(spans: List[Dict],
                   analyzer_names: List[str]) -> Dict[str, Dict]:
    """Run the named registered analyzers over one document's scenes —
    the reference's `analyze_scenes` loop, per doc."""
    instances = {n: ANALYZER_REGISTRY[n]() for n in analyzer_names}
    for scene in split_scenes(spans):
        for inst in instances.values():
            inst.analyze(scene)
    return {n: inst.display_analysis() for n, inst in instances.items()}


def scene_analysis(sf_dir: str,
                   analyzers: Tuple[str, ...] = ("DialogAverages",
                                                 "ActionVersusDialog"),
                   spans=None):
    """Corpus rollup of the plugin results: the per-doc plugin walk
    runs inside map_batches; the corpus answer is one summed row per
    analyzer metric (rows-only correctness: plugin protocol, not
    SQL-expressible).  ``spans`` / the session share skips
    re-extraction."""
    from .flagship import get_flagship_spans

    ds = get_flagship_spans(sf_dir, spans)

    def per_doc(batch: pa.Table) -> pa.Table:
        keys: List[str] = []
        vals: List[int] = []
        for spans in batch.column("spans").to_pylist():
            for name, result in analyze_scenes(spans or [],
                                               list(analyzers)).items():
                for metric, v in result.items():
                    keys.append(f"{name}.{metric}")
                    vals.append(int(v))
        return pa.table({"metric": pa.array(keys, pa.string()),
                         "value": pa.array(vals, pa.int64())})

    return (sorted_small(ds.map_batches(per_doc, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("metric")
              .aggregate(Sum("value", alias_name="total")), "metric"))
