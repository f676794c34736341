"""Placeholder — filled in subsequent milestones."""
