# Run the reference (datasciencetoolkit/NextGP.jl) on the committed fixture
# and record posterior-mean marker effects for the equivalence check.
#
# Usage (where Julia + NextGP are installed):
#   julia scripts/ref_equiv/ref_equiv.jl [chain] [burn] [thin]
# Writes scripts/ref_equiv/ref_out/beta_mean.csv (one value per SNP).
#
# Model: intercept + one whole-genome BayesPR region (the BWGR docs setup,
# /root/reference/docs/src/BWGR/BWGR.md:19-58) with default priors.
using CSV, DataFrames, StatsModels, NextGP, DelimitedFiles

here = @__DIR__
chain = length(ARGS) >= 1 ? parse(Int, ARGS[1]) : 20000
burn  = length(ARGS) >= 2 ? parse(Int, ARGS[2]) : 5000
thin  = length(ARGS) >= 3 ? parse(Int, ARGS[3]) : 10

pheno = CSV.read(joinpath(here, "fixture", "pheno.csv"), DataFrame)
genopath = joinpath(here, "fixture", "genotypes.txt")

f = @formula(y ~ 1 + SNP("M", genopath))
priorVar = Dict(:M => BayesPR(9999, 0.05), :e => Random("I", 1.0))

out = joinpath(here, "ref_out_run")
runLMEM(f, pheno, chain, burn, thin; VCV=priorVar, outFolder=out)

beta = summaryMCMC("betaM"; outFolder=out)
mkpath(joinpath(here, "ref_out"))
writedlm(joinpath(here, "ref_out", "beta_mean.csv"), vec(Matrix(beta)))
println("reference posterior means written to ref_out/beta_mean.csv")
