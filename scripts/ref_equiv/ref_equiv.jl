# Run the reference (datasciencetoolkit/NextGP.jl) on the committed fixture
# and record posterior-mean marker effects for the equivalence check.
#
# Usage (where Julia + NextGP are installed):
#   julia scripts/ref_equiv/ref_equiv.jl [method] [chain] [burn] [thin]
# method in {BayesPR, BayesB, BayesC, BayesR, BayesRCpi, BayesRCplus, BayesLV}
# Writes scripts/ref_equiv/ref_out/<method>/beta_mean.csv (one value per SNP).
#
# Priors MUST stay in sync with PRIORS in run.py (same fixture, same model:
# intercept + one marker set + Random("I", 1.0) residual).
using CSV, DataFrames, StatsModels, NextGP, DelimitedFiles

here = @__DIR__
method = length(ARGS) >= 1 ? ARGS[1] : "BayesPR"
chain = length(ARGS) >= 2 ? parse(Int, ARGS[2]) : 20000
burn  = length(ARGS) >= 3 ? parse(Int, ARGS[3]) : 5000
thin  = length(ARGS) >= 4 ? parse(Int, ARGS[4]) : 10

pheno = CSV.read(joinpath(here, "fixture", "pheno.csv"), DataFrame)
genopath = joinpath(here, "fixture", "genotypes.txt")
annot = readdlm(joinpath(here, "fixture", "annot.txt"))
lvcov = vec(readdlm(joinpath(here, "fixture", "lv_cov.txt")))

f = @formula(y ~ 1 + SNP("M", genopath))

prior = if method == "BayesPR"
    BayesPR(9999, 0.05)
elseif method == "BayesB"
    BayesB(0.1, 0.05; estimatePi=true)
elseif method == "BayesC"
    BayesC(0.1, 0.05; estimatePi=true)
elseif method == "BayesR"
    BayesR([0.9, 0.05, 0.03, 0.02], [0.0, 1e-4, 1e-3, 1e-2], 1.0; estimatePi=true)
elseif method == "BayesRCpi"
    BayesRCπ([0.9, 0.05, 0.05], [0.0, 1e-3, 1e-2], 1.0, annot; estimatePi=true)
elseif method == "BayesRCplus"
    BayesRCplus([0.9, 0.05, 0.05], [0.0, 1e-3, 1e-2], 1.0, annot; estimatePi=true)
elseif method == "BayesLV"
    covdf = DataFrame(x = lvcov)
    BayesLV(0.05, @formula(v ~ 1 + x), covdf, 0.1; estimateVarZeta=false)
elseif method == "BayesPR_D" || method == "BayesPR_Z"
    BayesPR(9999, 0.05)
elseif method == "BayesRCpi_D"
    BayesRCπ([0.9, 0.05, 0.05], [0.0, 1e-3, 1e-2], 1.0, annot; estimatePi=true)
elseif method == "BayesRCplus_D"
    BayesRCplus([0.9, 0.05, 0.05], [0.0, 1e-3, 1e-2], 1.0, annot; estimatePi=true)
elseif method == "BayesB_D"
    BayesB(0.1, 0.05; estimatePi=true)
elseif method == "BayesC_D"
    BayesC(0.1, 0.05; estimatePi=true)
elseif method == "BayesR_D"
    BayesR([0.9, 0.05, 0.03, 0.02], [0.0, 1e-4, 1e-3, 1e-2], 1.0; estimatePi=true)
elseif method == "BayesLV_D"
    covdf = DataFrame(x = lvcov)
    BayesLV(0.05, @formula(v ~ 1 + x), covdf, 0.1; estimateVarZeta=false)
elseif startswith(method, "MME_")
    nothing  # composite variants resolve their own model below
else
    error("unknown method $method")
end

# _D variants: heteroscedastic residual weights (the "D" structure)
weights = vec(readdlm(joinpath(here, "fixture", "weights.txt")))
ePrior = endswith(method, "_D") ? Random(weights, 1.0) : Random("I", 1.0)
priorVar = Dict(:M => prior, :e => ePrior)

# _Z variant: iid (1|grp) random effect on the committed grouping
if endswith(method, "_Z")
    groups = vec(readdlm(joinpath(here, "fixture", "groups.txt"), Int))
    pheno.grp = string.(groups)
    global f = @formula(y ~ 1 + (1|grp) + SNP("M", genopath))
    priorVar[:grp] = Random("I", 0.5)
end

# ---- composite MME variants (mirror run.py's COMPOSITES; same fixture) ----
# These reuse pheno_mme.csv (record ID column = animal label A*) and the
# pedigree/map/second-panel/SS files written by make_fixture.py.
if startswith(method, "MME_")
    pheno2 = CSV.read(joinpath(here, "fixture", "pheno_mme.csv"), DataFrame)
    animal = vec(readdlm(joinpath(here, "fixture", "animal.txt"), Int))
    pheno2.ID = ["A$(a+1)" for a in animal]
    pheno2.sex = vec(readdlm(joinpath(here, "fixture", "sex.txt")))
    pheno2.age = vec(readdlm(joinpath(here, "fixture", "age.txt")))
    pedpath = joinpath(here, "fixture", "pedigree.txt")
    geno2path = joinpath(here, "fixture", "geno2.txt")
    mappath = joinpath(here, "fixture", "map.csv")
    ssm = vec(readdlm(joinpath(here, "fixture", "ss_m.txt")))
    ssv = vec(readdlm(joinpath(here, "fixture", "ss_v.txt")))
    out = joinpath(here, "ref_out_run", method)
    betasets = ["M"]

    if method == "MME_PED"
        f2 = @formula(y ~ 1 + sex + age + PED(ID) + SNP("M", genopath))
        vcv = Dict(:ID => Random("A", 1.0), :M => BayesPR(9999, 0.05),
                   :e => Random("I", 1.0))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out,
                userPedData=pedpath)
    elseif method == "MME_CorrZ"
        # SHARED incidence: duplicate the animal column so both tuple
        # components hit the same level per record (the reference's tuple
        # sampleU is only a valid Gibbs sampler in that case — see
        # run.py/oracle_mme.py notes)
        pheno2.ID2 = pheno2.ID
        f2 = @formula(y ~ 1 + sex + age + PED(ID) + PED(ID2) + SNP("M", genopath))
        vcv = Dict((:ID, :ID2) => Random("A", [1.0 0.2; 0.2 0.6]),
                   :M => BayesPR(9999, 0.05), :e => Random("I", 1.0))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out,
                userPedData=pedpath)
    elseif method == "MME_CorrM"
        f2 = @formula(y ~ 1 + sex + age + SNP("M", genopath) + SNP("W", geno2path))
        vcv = Dict((:M, :W) => BayesPR(9999, [0.04 0.01; 0.01 0.03]),
                   :e => Random("I", 1.0))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out)
        betasets = ["M", "W"]
    elseif method == "MME_MultiSS"
        f2 = @formula(y ~ 1 + sex + age + SNP("M", genopath) + SNP("W", geno2path))
        vcv = Dict(:M => BayesPR(9999, 0.05), :W => BayesPR(9999, 0.05),
                   :e => Random("I", 1.0))
        ss = Dict(:M => SummaryStatistics(ssm, ssv))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out,
                blockThese=[(:sex, :age)], summaryStat=ss)
        betasets = ["M", "W"]
    elseif method == "MME_Window" || method == "MME_Chrom"
        r = method == "MME_Window" ? 50 : 99
        f2 = @formula(y ~ 1 + sex + age + SNP("M", genopath; map=mappath))
        vcv = Dict(:M => BayesPR(r, 0.05), :e => Random("I", 1.0))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out)
    elseif method == "MME_GBLUP"
        # GBLUP branch (prepMatVec.jl:123-127): panel -> vanRaden G^-1,
        # Z = I; beta_mean.csv holds the U means (record-order genomic
        # values), which run.py's committed mode compares directly
        f2 = @formula(y ~ 1 + sex + age + SNP("G", genopath))
        vcv = Dict(:G => Random("G", 1.0), :e => Random("I", 1.0))
        runLMEM(f2, pheno2, chain, burn, thin; VCV=vcv, outFolder=out)
        mkpath(joinpath(here, "ref_out", method))
        u = summaryMCMC("uG"; outFolder=out)
        writedlm(joinpath(here, "ref_out", method, "beta_mean.csv"),
                 vec(Matrix(u)))
        println("reference posterior means written to ref_out/$method/beta_mean.csv")
        exit(0)
    else
        error("unknown composite $method")
    end
    mkpath(joinpath(here, "ref_out", method))
    allbeta = vcat([vec(Matrix(summaryMCMC("beta$(s)"; outFolder=out)))
                    for s in betasets]...)
    writedlm(joinpath(here, "ref_out", method, "beta_mean.csv"), allbeta)
    println("reference posterior means written to ref_out/$method/beta_mean.csv")
    exit(0)
end

out = joinpath(here, "ref_out_run", method)
runLMEM(f, pheno, chain, burn, thin; VCV=priorVar, outFolder=out)

beta = summaryMCMC("betaM"; outFolder=out)
mkpath(joinpath(here, "ref_out", method))
writedlm(joinpath(here, "ref_out", method, "beta_mean.csv"), vec(Matrix(beta)))
println("reference posterior means written to ref_out/$method/beta_mean.csv")
