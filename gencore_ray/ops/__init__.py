"""Training-data-pipeline operators beyond the reference's surface:
text analysis, similarity search, multimodal plumbing."""
