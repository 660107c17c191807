"""Relational and analytic operators over the test star schema."""
