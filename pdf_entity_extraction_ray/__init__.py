"""ray-kg: Ray-Data-native knowledge-graph construction engine.

Key entry points:

* :func:`pdf_entity_extraction_ray.pipelines.kg.run_kg` — the flagship
  pages -> nodes/edges pipeline (checkpointed, resumable).
* :mod:`pdf_entity_extraction_ray.ops` — the training-data op family
  (dedup, ANN, text analysis, relational, multimodal).
* :mod:`pdf_entity_extraction_ray.sources.corpus` — deterministic synthetic
  pages corpus with planted gold.

Nothing in this package calls ``ray.init()``; sessions are owned by
scripts (`bench.py`, the CLI) and the test fixture.
"""

__version__ = "0.1.0"
