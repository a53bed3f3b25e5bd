"""Channel/system model library for ofdm_tpu."""

from ofdm_tpu.models.channels import (
    CHANNEL_MODELS,
    channel_frequency_response,
    channel_gains,
    get_channel,
    list_channels,
    normalize_impulse_response,
)

__all__ = [
    "CHANNEL_MODELS",
    "channel_frequency_response",
    "channel_gains",
    "get_channel",
    "list_channels",
    "normalize_impulse_response",
]
