"""Placeholder — filled in by later milestones."""
