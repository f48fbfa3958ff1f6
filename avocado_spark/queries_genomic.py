"""Genomic-pipeline query registrations (discovery, genotyping, trio,
square-off). Populated as the operator modules land — see queries.py
for the registry contract."""

from __future__ import annotations
