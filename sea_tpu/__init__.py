"""SEA-TPU: TPU-native State-Exchange Attention surrogate simulation framework."""

__version__ = "0.1.0"
