"""Named query modules; importing them populates the catalog registry."""
