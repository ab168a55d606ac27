# namespace: column-level geometry/text function helpers
