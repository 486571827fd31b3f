"""Distributed URL frontier + fetch scheduler (SURVEY.md §2.9, §7 Phase 3-4).

PySpark-native rebuild of the reference crawler contract
(reference README.md:129-204): frontier rounds as micro-batches over
snapshot-versioned tables, URL-seen dedup via bloom segments + exact
anti-join, per-host token-bucket politeness on a virtual clock, robots
allow/deny cache broadcast-joined to each batch, and salted host-hash
repartitioning between the dedup → politeness-group → fetch stages.
"""
