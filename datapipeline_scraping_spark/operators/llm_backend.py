"""Production-shaped batch LLM backend for the classifier seam (C2).

Mirrors the reference's Gemini batch call semantics
(``src/classifier.py:75-120``) without any network dependency baked
in: the transport — a ``prompt str -> response str`` callable — is
injected, so tests use a deterministic fake and production plugs the
real client (the reference's own test strategy,
``tests/test_classifier.py:103-105``).

Reference behaviors preserved exactly:
- prompt = category list + one ``id: title -- detail`` line per record
  (``src/classifier.py:84-92``);
- response parsed as a JSON array of ``{id, label}`` objects; the
  mapping is applied by id, NOT by position
  (``src/classifier.py:98-109``);
- malformed JSON, wrong shapes, or transport errors degrade to an
  empty mapping => every row in the batch gets the fallback label
  (``src/classifier.py:106-119``) — one bad API response must never
  kill the pipeline (same stance as q80's quarantine);
- ids missing from the response get the fallback label.

Inside Spark this runs per Arrow batch under ``mapInPandas`` via
``operators.classify.classify(backend=...)``; batch size is the
classifier config's ``batch_size`` (reference
``configs/classifier.yml:4``).
"""

from __future__ import annotations

import json
from collections.abc import Callable


def build_prompt(
    categories: tuple[str, ...], rows: list[tuple[str, str, str]]
) -> str:
    """Prompt in the reference's shape: closed category list, then one
    ``id: title -- detail`` line per record."""
    lines = [
        "Classify each record into exactly one of these categories:",
        ", ".join(categories),
        "",
        "Respond with a JSON array of objects {\"id\": ..., \"label\": ...}.",
        "",
    ]
    for rid, title, detail in rows:
        lines.append(f"{rid}: {title} -- {detail}")
    return "\n".join(lines)


def parse_response(text: str) -> dict[str, str]:
    """JSON array of {id, label} -> id->label map; anything malformed
    -> empty map (callers then apply the fallback to the whole batch,
    reference ``src/classifier.py:106-119``)."""
    try:
        data = json.loads(text)
        if not isinstance(data, list):
            return {}
        out = {}
        for item in data:
            if isinstance(item, dict) and "id" in item and "label" in item:
                out[str(item["id"])] = str(item["label"])
        return out
    except (json.JSONDecodeError, TypeError, ValueError):
        return {}


class BatchLLMBackend:
    """Backend callable for :func:`operators.classify.classify`.

    ``transport`` is the seam: ``prompt -> raw response text``. Any
    exception it raises is swallowed into the fallback path (the
    reference catches all API errors the same way)."""

    def __init__(
        self,
        categories: tuple[str, ...],
        transport: Callable[[str], str],
        *,
        id_col: str,
        title_col: str,
        detail_col: str,
        fallback: str = "otros",
    ) -> None:
        self.categories = categories
        self.transport = transport
        self.id_col = id_col
        self.title_col = title_col
        self.detail_col = detail_col
        self.fallback = fallback

    def __call__(self, pdf):
        rows = [
            (str(r[self.id_col]), str(r[self.title_col]), str(r[self.detail_col]))
            for _, r in pdf.iterrows()
        ]
        try:
            mapping = parse_response(
                self.transport(build_prompt(self.categories, rows))
            )
        except Exception:
            mapping = {}
        return pdf[self.id_col].map(
            lambda k: mapping.get(str(k), self.fallback)
        )
