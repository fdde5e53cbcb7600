"""Plans: build pipeline orchestration, manifests, driver-contract queries."""
