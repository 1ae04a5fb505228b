"""Catalyst-native relational plans: rollups, gap-fill, skew, packing."""
