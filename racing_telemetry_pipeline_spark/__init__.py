"""racing_telemetry_pipeline_spark — a from-scratch PySpark-native
log/telemetry pipeline with the data-processing capabilities of
tradewithmeai/racing-telemetry-pipeline (see SURVEY.md), transplanted onto
tables of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Stages (SURVEY.md §7.1):
  parse -> time-sync/drift-correct -> enrich -> route -> aggregate

Everything is expressed with the DataFrame API so Catalyst handles
pushdown/pruning/join strategy; the only Python-side compute is the
Arrow-vectorized grok parser (functions/grok.py).
"""

__version__ = "0.1.0"
