"""LLM-scale data-pipeline queries: dedup, similarity search, text
analysis over the documents/embeddings tables. Populated module by
module; see SURVEY.md §2 rows 25-35.
"""

from __future__ import annotations
