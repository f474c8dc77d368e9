"""Device-side compute kernels: constraint residuals and linear algebra."""
