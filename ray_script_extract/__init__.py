"""ray-script-extract: a Ray-Data-native document-extraction engine.

Brand-new engine (not a port) with the query/data-processing
capabilities of the reference screenplay-conversion service
(`gotoenchanter725/PDF-parser-TS`).  Input is a table of interleaved
text+media documents ``(doc_id, spans: list<struct<kind, text,
media_ref, offset>>)`` consumed as a ``ray.data.Dataset``; extraction
runs as ``map_batches`` over zero-copy Arrow batches on an actor pool;
output is the same span shape with screenplay-typed kinds.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — the
driver (bench.py, tests/conftest.py, CLI) owns the Ray session.
"""

__version__ = "0.1.0"
