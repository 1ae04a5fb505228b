"""Table formats, snapshots, and resumable checkpoint manifests."""
