"""Column-function library: text metrics, media decode plumbing, vector ops."""
