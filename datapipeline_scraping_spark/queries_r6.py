"""Round-6 registry queries: honest image-header decode over real
binary payloads, and multi-key blocked entity resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import multimodal as MM
from .queries import _t, q


# ===========================================================================
# honest image decode: real PNG/JPEG/GIF bytes, real header parsing
# ===========================================================================

@q(
    "q115_image_decode",
    oracle="""
SELECT doc_id,
  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 15 ELSE 14 END
    AS BIGINT) AS n_bytes,
  CAST(doc_id % 640 + 1 AS BIGINT) AS width,
  CAST(doc_id % 480 + 1 AS BIGINT) AS height
FROM documents
""",
)
def q115_image_decode(spark, sf_dir):
    """Image metadata extraction with REAL byte parsing end-to-end:
    each document id is rendered into a genuine minimal image file
    (PNG signature+IHDR / JPEG SOI+SOF0 / GIF89a screen descriptor,
    cycling by ``doc_id % 3``), and ``extract_media_meta`` reads the
    dimensions back OUT OF THE BYTES via the stdlib header parser
    (``operators/multimodal.py::decode_image``) — no imaging library,
    no deterministic fake on this path. The oracle recomputes the
    encoded dimensions arithmetically, so a parser that misreads a
    single header field hash-mismatches.

    Scale shape: blob synthesis and decode are both single-pass
    Arrow-batched map operations (no shuffle at all — the scan's
    partitioning carries through); at 100 TB the only change is that
    the blob column comes off object storage instead of being
    synthesized. Reference anchor: the multimodal carrier pattern is
    north-star surface (no reference equivalent; the closest is the
    binary-opaque document fetch, ``src/scrapers/detail_parser.py:97-119``)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def render(batches):
        import pandas as pd

        makers = (MM.make_png, MM.make_jpeg, MM.make_gif)
        for pdf in batches:
            blobs = [
                makers[int(i) % 3](int(i) % 640 + 1, int(i) % 480 + 1)
                for i in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(render, schema="doc_id long, blob binary")
    return MM.extract_media_meta(blobs, "doc_id")
