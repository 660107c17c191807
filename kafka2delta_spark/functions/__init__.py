"""(placeholder — filled in progressively)"""
