"""Presentation layer: trend plots over aggregated Spark results.

Port of the reference's plotly module (``/root/reference/scripts/
plotter.py:6-181``) with one structural change: the Spark-side
computation — the ONLY part that touches big data — is separated from
figure construction, so the engine's part (top-N genre selection, the
trends aggregate, a single ``toPandas`` of a k×years frame) is testable
and scale-correct without plotly installed (plotly is import-gated; it
is a driver-side presentation dependency, never an engine one).

Key divergence from the reference, recorded per SURVEY.md §3.3 ⚠: the
reference calls ``toPandas()`` on the full trends DataFrame once per
plot (3× recomputation of the whole Spark plan, then pandas-side
``nlargest``); here the top-N reduction happens IN Spark (broadcast
semi-join against the top-genre list) and the tiny result is collected
once and reused by every figure.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

__all__ = [
    "top_genres_by_votes",
    "trends_for_plot",
    "plot_genres_popularity",
    "plot_genres_rating",
    "plot_genres_interactive",
]


def top_genres_by_votes(trends: DataFrame, top_n: int = 10) -> DataFrame:
    """Top-N genres by total votes (deterministic ties: votes desc,
    genre asc). Replaces the reference's pandas
    ``groupby('genre')['totalVotes'].sum().nlargest(10)``
    (``plotter.py:18,61``) with a Spark-side reduction."""
    return (
        trends.groupBy("genre")
        .agg(F.sum("total_votes").alias("__tv"))
        .orderBy(F.col("__tv").desc(), F.col("genre").asc())
        .limit(top_n)
        .select("genre")
    )


def trends_for_plot(trends: DataFrame, top_n: int = 10) -> "pd.DataFrame":
    """One small pandas frame (top-N genres × years, sorted) feeding
    every figure below — collected ONCE (the reference re-executed the
    whole trends plan per plot, ``plotter.py:16,59`` +
    ``analysis.ipynb#cell38``)."""
    top = top_genres_by_votes(trends, top_n)
    return (
        trends.join(F.broadcast(top), "genre", "left_semi")
        .orderBy("genre", "startYear")
        .toPandas()
    )


def _require_plotly() -> Any:
    try:
        import plotly.graph_objects as go

        return go
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "plotly is not installed in this environment; "
            "trends data is available via trends_for_plot(...)"
        ) from exc


def _line_figure(
    pdf: "pd.DataFrame", y_col: str, y_title: str, title: str
):
    go = _require_plotly()
    fig = go.Figure()
    for genre in pdf["genre"].drop_duplicates():
        g = pdf[pdf["genre"] == genre]
        fig.add_trace(
            go.Scatter(
                x=g["startYear"],
                y=g[y_col],
                mode="lines+markers",
                name=genre,
                hovertemplate=(
                    f"<b>Genre:</b> {genre}<br>"
                    "<b>Year:</b> %{x}<br>"
                    f"<b>{y_title}:</b> %{{y}}<extra></extra>"
                ),
            )
        )
    fig.update_layout(
        title=title,
        xaxis_title="Year",
        yaxis_title=y_title,
        legend_title="Genre",
        hovermode="x unified",
        height=700,
    )
    return fig


def plot_genres_popularity(trends: DataFrame, top_n: int = 10):
    """Votes-over-time lines for the top-N genres
    (``plotter.py:6-46``)."""
    pdf = trends_for_plot(trends, top_n)
    return _line_figure(
        pdf,
        "total_votes",
        "Total Votes",
        f"Popularity by Genre Over Time (Top {top_n} by Votes Count)",
    )


def plot_genres_rating(trends: DataFrame, top_n: int = 10):
    """Average-rating-over-time lines for the top-N genres
    (``plotter.py:49-89``)."""
    pdf = trends_for_plot(trends, top_n)
    return _line_figure(
        pdf,
        "mean_rating",
        "Average Rating",
        f"Average Rating by Genre Over Time (Top {top_n} by Votes Count)",
    )


def plot_genres_interactive(trends: DataFrame, top_n: int = 10):
    """Dual-pane votes+rating figure with a genre dropdown
    (``plotter.py:92-181``)."""
    go = _require_plotly()
    from plotly.subplots import make_subplots

    pdf = trends_for_plot(trends, top_n)
    genres = list(pdf["genre"].drop_duplicates())
    fig = make_subplots(
        rows=2, cols=1, shared_xaxes=True,
        subplot_titles=("Total Votes", "Average Rating"),
    )
    for genre in genres:
        g = pdf[pdf["genre"] == genre]
        fig.add_trace(
            go.Scatter(x=g["startYear"], y=g["total_votes"],
                       mode="lines+markers", name=genre),
            row=1, col=1,
        )
        fig.add_trace(
            go.Scatter(x=g["startYear"], y=g["mean_rating"],
                       mode="lines+markers", name=genre,
                       showlegend=False),
            row=2, col=1,
        )
    buttons = [
        dict(
            label="All",
            method="update",
            args=[{"visible": [True] * (2 * len(genres))}],
        )
    ] + [
        dict(
            label=genre,
            method="update",
            args=[{
                "visible": [
                    v for g in genres for v in (g == genre, g == genre)
                ]
            }],
        )
        for genre in genres
    ]
    fig.update_layout(
        updatemenus=[dict(buttons=buttons, direction="down")],
        height=800,
        hovermode="x unified",
    )
    return fig
