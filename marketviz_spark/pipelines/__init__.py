"""Pipeline layer reproducing the reference's three entry points
(SURVEY §3): ingest -> compute_index -> analytics/export."""
