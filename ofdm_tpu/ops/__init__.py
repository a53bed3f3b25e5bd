"""TPU-native DSP ops: mapping, OFDM, channel, equalization, allocation, metrics."""
