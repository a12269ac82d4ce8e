"""Stage-level pipelines mirroring the reference's four-stage flow
(scrape -> clean -> populate -> serve), each a pure DataFrame function."""
