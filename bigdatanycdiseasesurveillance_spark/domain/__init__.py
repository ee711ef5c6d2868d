"""Domain layer: the reference system's NYC disease-surveillance
semantics — explicit source schemas, unified event normalization, and
the location-enrichment join cascade — re-expressed as broadcast
dimension tables + coalesce fallback chains."""
