"""Sketch-Engine registry file emit/parse — the last export artifact.

The reference ships corpus registry files (registry/rw_en23 etc.) and
subcorpus definition files (registry_subcorp/rw_en_subcorp) that Sketch
Engine's Manatee reads to index and slice a vertical corpus. The engine
already PARSES subcorpus definitions into predicates (operators/
subcorpus.py, P13); this module closes the write side:

- ``parse_registry`` / ``emit_registry``: the full registry grammar —
  ``KEY "value"`` header lines, ``ATTRIBUTE "name" { props }`` blocks, and
  ``STRUCTURE "name" { props + nested ATTRIBUTEs }`` (registry/rw_en23:
  1-17 header, :19-82 attributes, :83-199 structures). Emission normalizes
  whitespace; round-trip equality is on the parsed model.
- ``parse_subcorp`` / ``emit_subcorp``: the ``=name / structure /
  attr="regex"`` subcorpus syntax (registry_subcorp/rw_en_subcorp), kept
  loadable by subcorpus.load_subcorpora.
- ``registry_for_corpus``: build a registry from the engine's own corpus
  config (name/language/paths + the vert writer's positional attributes +
  doc-tag attribute names) — what a pipeline run emits next to its
  vertical files.

Driver-side string work only — registry files are O(attributes), never
data-sized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_KV_RE = re.compile(r'^\s*([A-Z0-9_]+)\s+"((?:[^"\\]|\\.)*)"\s*$')
_BLOCK_RE = re.compile(r'^\s*(ATTRIBUTE|STRUCTURE)\s+"([^"]+)"\s*\{?\s*$')
_SUB_HEADER_RE = re.compile(r"^=([A-Za-z0-9_]+)\s*$")
_SUB_COND_RE = re.compile(
    r'^\s*([A-Za-z0-9_]+)\s*(!?=)\s*"((?:[^"\\]|\\.)*)"\s*$'
)
_FREQ_RE = re.compile(r"^\*FREQLISTATTRS\s+(.*)$")


@dataclass
class Block:
    """An ATTRIBUTE or STRUCTURE block: ordered props + nested attributes."""

    kind: str  # "ATTRIBUTE" | "STRUCTURE"
    name: str
    props: list[tuple[str, str]] = field(default_factory=list)
    children: list["Block"] = field(default_factory=list)


@dataclass
class Registry:
    header: list[tuple[str, str]] = field(default_factory=list)
    attributes: list[Block] = field(default_factory=list)
    structures: list[Block] = field(default_factory=list)


def parse_registry(text: str) -> Registry:
    """Line-based parse of the registry grammar (brace-delimited blocks)."""
    reg = Registry()
    stack: list[Block] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line == "}":
            done = stack.pop()
            if stack:
                stack[-1].children.append(done)
            elif done.kind == "ATTRIBUTE":
                reg.attributes.append(done)
            else:
                reg.structures.append(done)
            continue
        b = _BLOCK_RE.match(line)
        if b:
            stack.append(Block(b.group(1), b.group(2)))
            continue
        kv = _KV_RE.match(line)
        if kv:
            pair = (kv.group(1), kv.group(2))
            if stack:
                stack[-1].props.append(pair)
            else:
                reg.header.append(pair)
    return reg


def _emit_block(b: Block, indent: int = 0) -> list[str]:
    pad = "    " * indent
    lines = [f'{pad}{b.kind} "{b.name}" {{']
    for k, v in b.props:
        lines.append(f'{pad}    {k} "{v}"')
    for child in b.children:
        lines += _emit_block(child, indent + 1)
    lines.append(f"{pad}}}")
    return lines


def emit_registry(reg: Registry) -> str:
    """Registry model → file text (normalized 4-space indentation)."""
    lines = [f'{k} "{v}"' for k, v in reg.header]
    for b in reg.attributes:
        lines.append("")
        lines += _emit_block(b)
    for b in reg.structures:
        lines.append("")
        lines += _emit_block(b)
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Subcorpus definition files
# ---------------------------------------------------------------------------


@dataclass
class SubcorpusDef:
    name: str
    structure: str  # the structure the conditions apply to: doc | s | ...
    conditions: list[tuple[str, str, str]]  # (attr, op, regex)


def parse_subcorp(text: str) -> tuple[list[str], list[SubcorpusDef]]:
    """Subcorp file → (freqlist attrs, ordered definitions). Same grammar
    subcorpus.load_subcorpora reads; this parse keeps the raw regexes so
    the file can be re-emitted."""
    freq: list[str] = []
    defs: list[SubcorpusDef] = []
    cur: SubcorpusDef | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        fm = _FREQ_RE.match(line)
        if fm:
            freq = fm.group(1).split()
            continue
        hm = _SUB_HEADER_RE.match(line)
        if hm:
            cur = SubcorpusDef(hm.group(1), "", [])
            defs.append(cur)
            continue
        cm = _SUB_COND_RE.match(line)
        if cm and cur is not None:
            cur.conditions.append((cm.group(1), cm.group(2), cm.group(3)))
        elif cur is not None and not cur.structure:
            cur.structure = line
    return freq, defs


def emit_subcorp(freq: list[str], defs: list[SubcorpusDef]) -> str:
    """Definitions → subcorp file text in the reference's layout
    (registry_subcorp/rw_en_subcorp): *FREQLISTATTRS, then =name blocks."""
    lines: list[str] = []
    if freq:
        lines.append("*FREQLISTATTRS " + " ".join(freq))
    for d in defs:
        lines.append("")
        lines.append(f"={d.name}")
        lines.append(f"  {d.structure}")
        for attr, op, pattern in d.conditions:
            lines.append(f'  {attr}{op}"{pattern}"')
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Registry builder from engine config
# ---------------------------------------------------------------------------

_LANG_NAMES = {"en": "English", "fr": "French", "es": "Spanish"}


def registry_for_corpus(
    corpus_id: str,
    language: str,
    info: str,
    base_path: str,
    positional_attrs: list[str],
    doc_attrs: list[str],
    sent_attrs: list[str] | None = None,
    subcorp_file: str | None = None,
    diachronic_attr: str | None = None,
    multivalue_attrs: set[str] | None = None,
    multisep: str = "|",
) -> Registry:
    """Build a registry for an engine-built corpus: positional attributes
    from the vert writer's column order, doc/sentence structure attributes
    from the doc-tag assembly (flatten.doc_tag_col keys), lowercase dynamic
    attributes for word/lemma as the reference defines them
    (registry/rw_en23:62-82)."""
    sent_attrs = sent_attrs if sent_attrs is not None else ["id", "lang"]
    multivalue_attrs = multivalue_attrs or set()
    header = [
        ("CORPUS", corpus_id),
        ("DEFAULTATTR", positional_attrs[0] if positional_attrs else "word"),
    ]
    if diachronic_attr:
        header.append(("DIACHRONIC", f"doc.{diachronic_attr}"))
    header += [
        ("DOCSTRUCTURE", "doc"),
        ("ENCODING", "UTF-8"),
        ("INFO", info),
        ("LANGUAGE", _LANG_NAMES.get(language, language)),
        ("NAME", f"{info} ({corpus_id})"),
        ("PATH", f"{base_path}/{corpus_id}/indexed/"),
        ("SUBCBASE", f"{base_path}/{corpus_id}/indexed/subcorp"),
    ]
    if subcorp_file:
        header.append(("SUBCDEF", subcorp_file))
    header.append(
        (
            "SUBCORPATTRS",
            ",".join(
                [f"s.{a}" for a in sent_attrs if a != "id"]
                + [f"doc.{a}" for a in doc_attrs]
            ),
        )
    )
    header.append(
        (
            "VERTICAL",
            f"| for FILE in $(ls {base_path}/{corpus_id}/vertical/"
            "*.[0-9]*.vert.xz | sort -t. -k2,2n); do xzcat $FILE; done;",
        )
    )
    attributes = []
    for a in positional_attrs:
        props = [("TYPE", "MD_MGD")]
        if a in multivalue_attrs:
            props += [("MULTISEP", multisep), ("MULTIVALUE", "y")]
        attributes.append(Block("ATTRIBUTE", a, props))
    for src in ("word", "lemma"):
        if src in positional_attrs:
            attributes.append(
                Block(
                    "ATTRIBUTE",
                    "lc" if src == "word" else f"{src}_lc",
                    [
                        ("TYPE", "MD_MGD"),
                        ("ARG1", "C"),
                        ("DYNAMIC", "utf8lowercase"),
                        ("DYNLIB", "internal"),
                        ("DYNTYPE", "freq"),
                        ("FROMATTR", src),
                        ("FUNTYPE", "s"),
                        ("LABEL", f"{src} (lowercase)"),
                        ("TRANSQUERY", "yes"),
                    ],
                )
            )
    structures = [
        Block(
            "STRUCTURE",
            "s",
            [],
            [
                Block("ATTRIBUTE", a, [("TYPE", "MD_MGD")])
                for a in sent_attrs
            ],
        ),
        Block(
            "STRUCTURE",
            "doc",
            [("TYPE", "MD_MGD")],
            [
                Block(
                    "ATTRIBUTE",
                    a,
                    [("TYPE", "MD_MGD")]
                    + (
                        [("MULTIVALUE", "1"), ("MULTISEP", multisep)]
                        if a in multivalue_attrs
                        else []
                    ),
                )
                for a in doc_attrs
            ],
        ),
    ]
    return Registry(header, attributes, structures)
