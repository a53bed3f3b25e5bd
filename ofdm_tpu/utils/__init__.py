"""Host-side utilities: result management, plotting, live watching."""

from ofdm_tpu.utils.visualization import (
    plot_adaptive_constellation_diagram,
    plot_combined_constellation_analysis,
    plot_constellation_order_distribution,
    plot_water_level_diagram,
)

__all__ = [
    "plot_constellation_order_distribution",
    "plot_combined_constellation_analysis",
    "plot_water_level_diagram",
    "plot_adaptive_constellation_diagram",
]
