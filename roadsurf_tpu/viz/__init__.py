"""Visualization: first-party standalone-HTML/SVG charts (replaces the
reference's plotly HTML dashboards, final_metrics.py:574-742)."""

from .charts import Figure

__all__ = ["Figure"]
