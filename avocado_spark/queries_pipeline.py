"""Training-data pipeline query registrations (dedup, similarity,
text analysis) over the documents/embeddings tables. Populated as the
operator modules land — see queries.py for the registry contract."""

from __future__ import annotations
