"""Distributed inverted-index construction and segment lifecycle."""
